"""Device floors for the FCM hot-path slice (VERDICT r4 next #3).

XLA runs the CAM++ FCM front-end (reference ``ppvector/models/campplus.py:
246-281``) in 6.0 ms at b256 x 3 s — 44% of the embed batch — at ~25%
useful MXU occupancy (Cout 32 padded to 128). The question this tool
answers with device numbers: is that 6.0 ms close to the floor of the
PADDED computation, and would a space-to-depth packed reformulation
(pack F by 4 into channels so every conv runs 128->128) actually be
faster, counting the redundant FLOPs packing introduces?

Arithmetic behind the packed variant (derived, then measured here):
an F-banded 3-tap conv on a pack-4 layout needs, with a one-row
alignment shift, a (2,3) kernel over 128->128 channels whose weights are
3/8 dense — i.e. 2*3*4*C^2 MACs per unpacked position vs the useful
9*C^2: a fixed 2.67x redundancy for stride-1 convs (4x for stride-2,
where the input span is 9 rows). Packing trades the MXU's 4x Cout
padding for >=2.67x of real work, so its end-to-end ceiling is only
~10-20% below XLA — IF the packed convs run at full occupancy and the
relayouts are free. This tool measures, per conv of the 12-conv stage:

  xla     — the conv exactly as the model dispatches it (bf16, NHWC)
  padded  — a dense matmul at the MXU-padded shape XLA must execute:
            (M=B*Fout*T, K=taps*Cin, N=128)
  packed  — the packed-reformulation equivalent:
            stride-1: (M=B*Fout*T/4, K=6*128, N=128)
            stride-2: (M=B*Fout*T/4, K=9*128, N=128)

plus the pack/unpack relayout costs. Sums close the item either way:
if sum(xla) <= ~1.15 * sum(packed + relayout), the packed redesign is
dead and XLA keeps the hot bucket.

    python tools/fcm_floor_bench.py [batch] [seconds] [iters]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
from _bench import cache_dir, chain_ms, kaldi_frames
jax.config.update("jax_compilation_cache_dir", cache_dir())
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    # production frame count (the recorded round-5 ROADMAP table was
    # measured at T=297 from an off-by-one formula — a 0.3% geometry
    # difference, immaterial to its 0.81/0.90 floor ratios)
    t = kaldi_frames(secs * 16000)
    rng = np.random.RandomState(0)
    print(f"batch={batch} T={t} iters={iters} dev={jax.devices()[0]}",
          flush=True)

    C = 32
    # (name, Fin, Fout, Cin, Cout, kh, kw, stride)
    convs = [
        ("conv1",      80, 80,  1, C, 3, 3, 1),
        ("b1.conv1",   80, 40,  C, C, 3, 3, 2),
        ("b1.short",   80, 40,  C, C, 1, 1, 2),
        ("b1.conv2",   40, 40,  C, C, 3, 3, 1),
        ("b2.conv1",   40, 40,  C, C, 3, 3, 1),
        ("b2.conv2",   40, 40,  C, C, 3, 3, 1),
        ("b3.conv1",   40, 20,  C, C, 3, 3, 2),
        ("b3.short",   40, 20,  C, C, 1, 1, 2),
        ("b3.conv2",   20, 20,  C, C, 3, 3, 1),
        ("b4.conv1",   20, 20,  C, C, 3, 3, 1),
        ("b4.conv2",   20, 20,  C, C, 3, 3, 1),
        ("Conv_1",     20, 10,  C, C, 3, 3, 2),
    ]

    tot = {"xla": 0.0, "padded": 0.0, "packed": 0.0}
    print(f"{'conv':>9} {'xla':>7} {'padded':>7} {'packed':>7}   "
          f"(ms/iter, b{batch})", flush=True)
    for name, fi, fo, ci, co, kh, kw, s in convs:
        x = jnp.asarray(rng.randn(batch, fi, t, ci).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        conv = lambda xx, w=w, s=s, pad=pad: jax.lax.conv_general_dilated(
            xx, w, (s, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ms_xla = chain_ms(conv, x, iters)

        # padded-MXU floor: dense matmul at the shape the MXU executes
        m = batch * fo * t
        k = kh * kw * ci
        a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
        bmat = jnp.asarray(rng.randn(k, 128).astype(np.float32) * 0.1,
                           jnp.bfloat16)
        ms_pad = chain_ms(lambda aa, bmat=bmat: aa @ bmat, a, iters)

        # packed-reformulation floor (pack-4 channels; stride-2 spans 9
        # rows -> 3-tap packed kernel)
        kp = 2 if s == 1 else 3
        mp = batch * max(fo // 4, 1) * t
        kk = kp * kw * 128
        ap = jnp.asarray(rng.randn(mp, kk).astype(np.float32), jnp.bfloat16)
        bp = jnp.asarray(rng.randn(kk, 128).astype(np.float32) * 0.1,
                         jnp.bfloat16)
        ms_pk = chain_ms(lambda aa, bp=bp: aa @ bp, ap, iters)

        tot["xla"] += ms_xla
        tot["padded"] += ms_pad
        tot["packed"] += ms_pk
        print(f"{name:>9} {ms_xla:7.3f} {ms_pad:7.3f} {ms_pk:7.3f}",
              flush=True)

    # relayout costs the packed variant must also pay: initial pack
    # (B,80,T,1)->(B,20,T,4), two repacks at the stride-2 boundaries
    # (F halves -> restore pack-4 channel width), final unpack to the
    # trunk's (B,T,320)
    x0 = jnp.asarray(rng.randn(batch, 80, t, 1).astype(np.float32),
                     jnp.bfloat16)
    ms_pack = chain_ms(
        lambda xx: xx.reshape(batch, 20, 4, t).transpose(0, 1, 3, 2), x0,
        iters)
    x1 = jnp.asarray(rng.randn(batch, 10, t, 128).astype(np.float32),
                     jnp.bfloat16)
    ms_repack = chain_ms(
        lambda xx: xx.reshape(batch, 5, 2, t, 128)
        .transpose(0, 1, 3, 2, 4).reshape(batch, 5, t, 256), x1, iters)
    ms_unpack = chain_ms(
        lambda xx: xx.transpose(0, 2, 1, 3).reshape(batch, t, 1280), x1,
        iters)
    relayout = ms_pack + 2 * ms_repack + ms_unpack

    print(f"\n{'SUM':>9} {tot['xla']:7.3f} {tot['padded']:7.3f} "
          f"{tot['packed']:7.3f}", flush=True)
    print(f"relayouts (pack + 2 repack + unpack): {relayout:.3f} ms",
          flush=True)
    print(f"packed total incl. relayouts: {tot['packed'] + relayout:.3f} ms",
          flush=True)
    print(f"xla / padded-floor  = {tot['xla'] / tot['padded']:.3f}",
          flush=True)
    print(f"xla / packed-total  = "
          f"{tot['xla'] / (tot['packed'] + relayout):.3f}", flush=True)


if __name__ == "__main__":
    main()
