"""On-device numerics check for the SDConv training ops: forward and all
three gradients vs lax.conv + jax.grad, both strides, fp32 and bf16.

    python tools/sdconv_device_check.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from voiceprintrecognition_paddlepaddle_tpu.models.pallas_conv2d import (
    conv2d_sd)


def ref(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    ok = True
    for dtype, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 3e-2)):
        for stride in (1, 2):
            x = jnp.asarray(rng.randn(4, 40, 37, 32), dtype)
            w = jnp.asarray(rng.randn(3, 3, 32, 32) * 0.1, dtype)
            b = jnp.asarray(rng.randn(32), dtype)
            cot = jnp.asarray(rng.randn(4, 40 // stride, 37, 32), dtype)
            r = np.asarray(ref(x, w, b, stride), np.float32)
            g = np.asarray(conv2d_sd(x, w, b, stride), np.float32)
            rel = np.abs(r - g).max() / max(1.0, np.abs(r).max())
            print(f"fwd  {dtype.__name__} s{stride}: rel {rel:.2e}")
            ok &= rel < tol
            gr = jax.grad(lambda *a: (ref(*a, stride).astype(jnp.float32)
                                      * cot.astype(jnp.float32)).sum(),
                          argnums=(0, 1, 2))(x, w, b)
            gp = jax.grad(lambda *a: (conv2d_sd(*a, stride)
                                      .astype(jnp.float32)
                                      * cot.astype(jnp.float32)).sum(),
                          argnums=(0, 1, 2))(x, w, b)
            for name, rr, pp in zip("dx dw db".split(), gr, gp):
                rr = np.asarray(rr, np.float32)
                pp = np.asarray(pp, np.float32)
                rel = np.abs(rr - pp).max() / max(1.0, np.abs(rr).max())
                print(f"  {name} {dtype.__name__} s{stride}: rel {rel:.2e}")
                ok &= rel < tol
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
