"""Fused attention BACKWARD kernel validation + perf (run on the TPU).

Checks _pallas_packed_attention_bwd's dqkv/dbias against the VJP of the
XLA reference composition (expect bf16-ulp agreement) including masked
keys and a fully-masked batch row (where the XLA path itself NaNs but the
kernel must stay finite), then times a chained grad step.

Run: python tools/attention_bwd_probe.py
"""
import sys
import os
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root); sys.path.insert(0, os.path.join(_root, "tools"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from perf_probe import timeit
from vl_merging_tpu.ops.attention import (
    _packed_attention_diff, _packed_reference)

B, Np, H, C = 6, 592, 12, 768
rng = np.random.RandomState(0)
qkv = jnp.asarray(rng.randn(B, Np, 3*C).astype(np.float32)).astype(jnp.bfloat16)
bias = jnp.asarray(rng.randn(H, Np, Np).astype(np.float32) * 0.1)
mask_np = np.ones((B, Np), np.int32)
mask_np[:, 580:] = 0         # padded keys
mask_np[5, :] = 0            # fully padded batch row
mask = jnp.asarray(mask_np)
ct = rng.randn(B, Np, C).astype(np.float32)
ct[5] = 0                    # zero cotangent on the padded row
ct = jnp.asarray(ct).astype(jnp.bfloat16)

def loss_pallas(qkv, bias):
    out = _packed_attention_diff(qkv, bias, mask, 0.125, H, 2)
    return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))

def loss_ref(qkv, bias):
    out = _packed_reference(qkv, bias, mask, 0.125, H)
    return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))

gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))
gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))
dq_p, db_p = gp(qkv, bias)
dq_r, db_r = gr(qkv, bias)
dq_p, db_p, dq_r, db_r = map(lambda t: np.asarray(t, np.float64),
                             (dq_p, db_p, dq_r, db_r))
ok = slice(0, 5)   # row 5 is fully masked: XLA's own grad is NaN there
print("dqkv max abs diff:", np.abs(dq_p[ok] - dq_r[ok]).max(),
      "ref scale:", np.abs(dq_r[ok]).max())
print("pallas dqkv on masked row is finite:", np.isfinite(dq_p[5]).all())
print("dbias max abs diff:", np.abs(db_p - db_r).max(),
      "ref scale:", np.abs(db_r).max())
print("NaNs:", np.isnan(dq_p).any(), np.isnan(db_p).any())
