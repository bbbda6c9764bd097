#!/usr/bin/env python3
"""Localize the composed int16-input regression to a decode stage.

probe_menu_ab: the full i16 menu loses ~1.1 ms end-to-end vs
D-bf16+E-i16, even though probe_i16_cost shows its components win
(skew store 0.38 vs 1.04 ms, windowed dequant loads faster).  The only
stages that differ between the two menus are skew (int16 stores) and
the fwd/bwd phase kernels' *input* reads (int16 + dequant multiply vs
fp32).  This probe times, under both menus, in one process with
interleaved baseline re-runs: (1) the two input skews alone, (2) the
forward phase loop alone (skews excluded — pre-skewed operands), so
the regression pins to a stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_fwd_i16.py
"""

import functools
import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.dp_bm import (
    DTypeMenu, MODE_BOUNDS, _block_spec, _carry_spec, _compiler_params,
    _fit_T, _fwd_phase_kernel, _interpret, _len_spec, _pad_vec,
    _phase_plan, _stream_inv, _unfold_dims, _vt_spec, _i32, LANE, T_FWD,
    skew_input)
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
MENU_A = DTypeMenu.make(d="bfloat16", e="int16")
MENU_B = DTypeMenu.make(stream="int16", d="bfloat16", e="int16")

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)


def fwd_phases(th, ad, menu):
    """The forward phase loop of decode_stream_bm, standalone."""
    Kc, S, Bp = th.shape
    K2 = _unfold_dims(th)
    dtype = jnp.float32
    ddt = menu.d_dtype or dtype
    T = min(_fit_T(T_FWD, K2, S, [th.dtype, ad.dtype, ddt, ddt]),
            _fit_T(dp_bm.T_BWD, K2, S,
                   [ddt, ddt, menu.e_dtype or dtype] + [dtype] * 3))
    KBc = Kc // T
    plan = _phase_plan(K2, S, T, Kc)
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo_f = MODE_BOUNDS["nw"][0]
    cz = jnp.zeros((S, Bp), dtype)
    vt = jnp.zeros((8, Bp), dtype)
    v1, v2 = cz, cz
    dxs = []
    for (k0, nk, w0, w1) in plan:
        W = w1 - w0
        kern = functools.partial(
            _fwd_phase_kernel, lo=lo_f, operator="softmax", T=T, k0=k0,
            w0=w0, w1=w1, inv=_stream_inv(th.dtype, menu.stream_range))
        seg = functools.partial(_block_spec, T, W)
        inw = pl.BlockSpec(
            (pl.Element(T), pl.Element(W), pl.Element(LANE)),
            lambda b, k, k0=k0, w0=w0: (
                _i32(((k0 + k) % KBc) * T), _i32(w0), b * LANE),
            memory_space=dp_bm.pltpu.VMEM)
        vt, dxseg, dmseg, v1, v2 = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=[_len_spec(), _len_spec(),
                      _vt_spec(), _carry_spec(S), _carry_spec(S),
                      inw, inw],
            out_specs=[_vt_spec(), seg(lambda k: k), seg(lambda k: k),
                       _carry_spec(S), _carry_spec(S)],
            out_shape=[
                jax.ShapeDtypeStruct((8, Bp), dtype),
                jax.ShapeDtypeStruct((nk * T, W, Bp), ddt),
                jax.ShapeDtypeStruct((nk * T, W, Bp), ddt),
                jax.ShapeDtypeStruct((S, Bp), dtype),
                jax.ShapeDtypeStruct((S, Bp), dtype),
            ],
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(lnp, lmp, vt, v1, v2, th, ad)
        dxs.append(dxseg)
    return vt, dxs


results = {}


def run(name, fn, *args):
    try:
        dt = time_op(fn, *args, reps=8, iters=3)
        results[name] = round(dt * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    print(name, results[name], flush=True)


ths_A = skew_input(theta, dtypes=MENU_A)
ads_A = skew_input(A, dtypes=MENU_A)
ths_B = skew_input(theta, dtypes=MENU_B)
ads_B = skew_input(A, dtypes=MENU_B)

# sanity: fwd phases agree across menus on the terminal scores
vt_A, _ = fwd_phases(ths_A, ads_A, MENU_A)
vt_B, _ = fwd_phases(ths_B, ads_B, MENU_B)
print("vt max rel err:",
      float(jnp.max(jnp.abs(vt_B - vt_A) / (jnp.abs(vt_A) + 1e-6))),
      flush=True)

run("skews_fp32_a", lambda t, a, _eps=0.0: (
    skew_input(t, dtypes=MENU_A), skew_input(a, dtypes=MENU_A)), theta, A)
run("skews_i16", lambda t, a, _eps=0.0: (
    skew_input(t, dtypes=MENU_B), skew_input(a, dtypes=MENU_B)), theta, A)
run("fwd_fp32in_a", lambda t, a, _eps=0.0: fwd_phases(t, a, MENU_A),
    ths_A, ads_A)
run("fwd_i16in", lambda t, a, _eps=0.0: fwd_phases(t, a, MENU_B),
    ths_B, ads_B)
run("fwd_fp32in_b", lambda t, a, _eps=0.0: fwd_phases(t, a, MENU_A),
    ths_A, ads_A)
run("skews_fp32_b", lambda t, a, _eps=0.0: (
    skew_input(t, dtypes=MENU_A), skew_input(a, dtypes=MENU_A)), theta, A)
print(json.dumps(results))
