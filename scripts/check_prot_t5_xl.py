#!/usr/bin/env python3
"""On-chip check that a ProtT5-XL-geometry encoder forward fits and runs
(VERDICT round-1 item 7): 24 layers, d_model 1024, d_ff 16384, 32 heads,
len-1024 input, bf16 compute — the configuration ``--pretrain-path`` +
``--precision bf16`` builds (reference wraps the same geometry:
deepblast/language_model.py:21-47, Rostlab/prot_t5_xl_uniref50).

Prints one JSON line {"params_M", "ms_per_seq", "peak_bytes"}.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python scripts/check_prot_t5_xl.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.models.lm import T5Config, T5Encoder
from deepblast_tpu.utils.timing import time_op

B, L = 2, 1024
cfg = T5Config.prot_t5_xl(dtype=jnp.bfloat16)
if jax.default_backend() != "tpu":
    cfg = T5Config.tiny()
    B, L = 2, 64

model = T5Encoder(cfg)
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, L)), jnp.int32)
params = jax.jit(model.init)(jax.random.key(0), tokens)
if cfg.dtype == jnp.bfloat16:
    # bf16 parameter storage — the serving config (converted HF weights
    # load the same way); frees headroom for the timing harness's
    # independent operand copies
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params)
n_params = sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))

fwd = jax.jit(model.apply)
out = fwd(params, tokens)
assert out.shape == (B, L, cfg.d_model)
assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

dt = time_op(lambda p, t, _eps=0.0: model.apply(p, t), params, tokens,
             reps=2, iters=3, copy_argnums=(1,))  # share the 2.4 GB
             # bf16 params across reps; distinct tokens defeat CSE
mem = jax.devices()[0].memory_stats() or {}
print(json.dumps({
    "params_M": round(n_params / 1e6, 1),
    "ms_per_seq": round(dt * 1e3 / B, 1),
    "peak_bytes": int(mem.get("peak_bytes_in_use", -1)),
    "geometry": f"L{cfg.num_layers} d{cfg.d_model} ff{cfg.d_ff} len{L}",
}))
