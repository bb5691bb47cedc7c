"""Whole-trunk Pallas CAM++ kernel vs the XLA path (interpret mode on CPU;
the same comparison runs on device in tools/ benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM
from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus import (
    campplus_embed_pallas, trunk_plan, trunk_stats_pallas)


@pytest.fixture(scope="module")
def model_and_vars():
    model = CAMPPlus(input_size=80, embd_dim=192)
    feats = jnp.zeros((2, 298, 80), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    return model, variables


def _cos(a, b):
    return float(np.min((a * b).sum(-1)
                        / (np.linalg.norm(a, axis=-1)
                           * np.linalg.norm(b, axis=-1))))


def test_plan_shapes():
    plan = trunk_plan()
    assert plan["n_layers"] == 52
    assert plan["lin1_rows"] == sum(l["cin"] for l in plan["layers"])
    assert plan["final_channels"] == 512
    assert [b["c_out"] for b in plan["blocks"]] == [512, 1024, 1024]


def test_trunk_kernel_matches_xla(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(4, 298, 80).astype(np.float32))
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(campplus_embed_pallas(model, variables, feats,
                                           interpret=True))
    assert got.shape == ref.shape
    assert _cos(ref, got) > 0.9999
    assert np.abs(ref - got).max() < 5e-3


def test_trunk_kernel_short_clip_single_segment(model_and_vars):
    """1.5 s diarization chunks: stem T=74 < seg_len -> one segment."""
    model, variables = model_and_vars
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(3, 148, 80).astype(np.float32))
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(campplus_embed_pallas(model, variables, feats,
                                           interpret=True))
    assert _cos(ref, got) > 0.9999


def test_trunk_kernel_batch_padding(model_and_vars):
    """Batch not divisible by the utterances-per-step tile."""
    model, variables = model_and_vars
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(5, 298, 80).astype(np.float32))
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(campplus_embed_pallas(model, variables, feats,
                                           interpret=True))
    assert got.shape == (5, 192)
    assert _cos(ref, got) > 0.9999


def test_trunk_stats_match_xla_stats(model_and_vars):
    """The kernel's pooled stats equal FCM→trunk→stats on the XLA side."""
    model, variables = model_and_vars
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 298, 80).astype(np.float32))
    fcm = FCM()
    fcm_out = fcm.apply({"params": variables["params"]["FCM_0"],
                         "batch_stats": variables["batch_stats"]["FCM_0"]},
                        feats, train=False)
    stats = np.asarray(trunk_stats_pallas(variables, fcm_out,
                                          interpret=True))
    assert stats.shape == (2, 1024)
    assert np.isfinite(stats).all()
    assert (stats[:, 512:] >= 0).all()  # std half non-negative


def test_trunk_kernel_masked_padded_batch(model_and_vars):
    """Padded/bucketed batch with per-utterance valid lengths: the masked
    kernel path must match exact-length embedding of each clip (the
    padding-invariance contract, cf. tests/test_padding_invariance.py)."""
    model, variables = model_and_vars
    rng = np.random.RandomState(4)
    t_bucket, valids = 298, [298, 200, 145]
    feats_full = rng.randn(3, t_bucket, 80).astype(np.float32)
    feats_pad = feats_full.copy()
    for i, v in enumerate(valids):
        feats_pad[i, v:] = 0.0

    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus import \
        trunk_geometry
    t_valid_full = trunk_geometry(t_bucket)[0]
    tvalids = [int(np.ceil(v / t_bucket * t_valid_full)) for v in valids]
    got = np.asarray(campplus_embed_pallas(
        model, variables, jnp.asarray(feats_pad), interpret=True,
        tvalids=tvalids))

    for i, v in enumerate(valids):
        exact = np.asarray(campplus_embed_pallas(
            model, variables, jnp.asarray(feats_full[i:i + 1, :v]),
            interpret=True))[0]
        assert _cos(exact[None], got[i:i + 1]) > 0.999, (i, v)


def test_looped_variant_long_clip_matches_xla(model_and_vars):
    """Clips past the unrolled variant's compile wall (t_pad > 160)
    dispatch to the LOOPED kernel (per-block fori_loops over channel
    groups); parity against XLA on a ~6 s clip, including the 3-D
    out-slab layout at u not a multiple of 8."""
    from voiceprintrecognition_paddlepaddle_tpu.models import \
        pallas_campplus as pc
    model, variables = model_and_vars
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(3, 602, 80).astype(np.float32))
    t_valid, t_pad, u, _ = pc.trunk_geometry(602)
    assert pc._use_looped(t_pad)  # the long-clip path under "auto"
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(campplus_embed_pallas(model, variables, feats,
                                           interpret=True))
    assert _cos(ref, got) > 0.9999


def test_looped_variant_masked_long_clip(model_and_vars):
    """Masked padded-batch eval path through the looped kernel: padded
    ~6 s bucket with mixed valid lengths vs per-clip XLA."""
    from voiceprintrecognition_paddlepaddle_tpu.models import \
        pallas_campplus as pc
    model, variables = model_and_vars
    rng = np.random.RandomState(4)
    t_pad_frames = 602
    valids = [602, 450]
    feats_pad = np.zeros((2, t_pad_frames, 80), np.float32)
    for i, v in enumerate(valids):
        feats_pad[i, :v] = rng.randn(v, 80)
    _, t_pad, _, _ = pc.trunk_geometry(t_pad_frames)
    assert pc._use_looped(t_pad)
    got = np.asarray(campplus_embed_pallas(
        model, variables, jnp.asarray(feats_pad), interpret=True,
        tvalids=[(v - 1) // 2 + 1 for v in valids]))
    for i, v in enumerate(valids):
        ref = np.asarray(model.apply(
            variables, jnp.asarray(feats_pad[i:i + 1, :v]), train=False))
        cos = float((ref[0] * got[i]).sum()
                    / (np.linalg.norm(ref[0]) * np.linalg.norm(got[i])))
        assert cos > 0.999, (i, cos)


def test_masked_embed_fn_full_path(model_and_vars):
    """The Trainer.evaluate()/serving masked closure end-to-end on CPU
    interpret: waveforms -> featurizer -> FCM kernel -> masked trunk
    kernel -> head, per-utterance ratios, vs the XLA model with the same
    features and lengths."""
    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus \
        import make_campplus_masked_embed_fn
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import \
        AudioFeaturizer

    model, variables = model_and_vars
    feat = AudioFeaturizer(feature_method="Fbank",
                           method_args={"sr": 16000, "n_mels": 80})
    fn = make_campplus_masked_embed_fn(model, variables, feat,
                                       interpret=True)
    rng = np.random.RandomState(7)
    waves = (rng.randn(3, 32000) * 0.05).astype(np.float32)
    ratios = np.asarray([1.0, 0.75, 0.4], np.float32)
    for i, r in enumerate(ratios):
        waves[i, int(r * 32000):] = 0.0
    got = np.asarray(fn(waves, ratios))

    feats = feat.featurize(jnp.asarray(waves), input_lens_ratio=ratios)
    ref = np.asarray(model.apply(variables, feats, train=False,
                                 lengths=jnp.asarray(ratios)))
    assert _cos(ref, got) > 0.999


def test_sharded_embed_fn_matches_single_device(model_and_vars):
    """The shard_map data-parallel fast path (VERDICT r3 item 3): the
    fused kernel stack runs per-device over the 8-device CPU mesh in
    interpret mode and must produce embeddings identical to the
    single-device masked closure — proving multi-chip serving keeps the
    Pallas path instead of silently dropping to XLA."""
    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus \
        import (make_campplus_masked_embed_fn,
                make_campplus_sharded_embed_fn)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import \
        AudioFeaturizer
    from voiceprintrecognition_paddlepaddle_tpu.parallel.mesh import \
        create_mesh

    model, variables = model_and_vars
    feat = AudioFeaturizer(feature_method="Fbank",
                           method_args={"sr": 16000, "n_mels": 80})
    mesh = create_mesh(jax.devices())
    assert mesh.devices.size == 8
    sharded = make_campplus_sharded_embed_fn(model, variables, mesh, feat,
                                             interpret=True)
    single = make_campplus_masked_embed_fn(model, variables, feat,
                                           interpret=True)
    rng = np.random.RandomState(11)

    # ragged bucket: batch not a multiple of u * n_devices, mixed lengths
    waves = (rng.randn(11, 16000) * 0.05).astype(np.float32)
    ratios = np.linspace(0.35, 1.0, 11).astype(np.float32)
    for i, r in enumerate(ratios):
        waves[i, int(r * 16000):] = 0.0
    got = np.asarray(sharded(waves, ratios))
    ref = np.asarray(single(waves, ratios))
    assert got.shape == ref.shape == (11, 192)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)

    # exact-length batch, ratios=None; both sides use the pooling
    # matmuls so the comparison is near-exact (the reshape-gating
    # "uniform gates" variant was device-measured 20x slower and
    # deleted — ROADMAP "Measured decisions")
    waves_u = (rng.randn(8, 16000) * 0.05).astype(np.float32)
    got_u = np.asarray(sharded(waves_u))
    ref_u = np.asarray(single(waves_u, np.ones((8,), np.float32)))
    np.testing.assert_allclose(got_u, ref_u, rtol=0, atol=2e-4)
    assert _cos(ref_u, got_u) > 0.999999
