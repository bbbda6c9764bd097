"""Differentiable smoothed alignment DP — public API and autodiff wiring.

This module replaces the reference's paired ``torch.autograd.Function``
machinery (reference: deepblast/nw.py:315-386, deepblast/nw_cuda.py:168-262)
with two nested :func:`jax.custom_vjp` functions:

``alignment_score(theta, A, lengths) -> Vt``
    The terminal smoothed alignment score.  Its VJP *is* the expected
    alignment — the posterior marginal matrix ``E`` — computed by the reverse
    DP pass.

``expected_alignment(theta, A, lengths, Et) -> (E_theta, E_A)``
    The gradient map itself, exposed as a first-class differentiable
    function (this is ``decode`` in the reference,
    deepblast/nw.py:446-458).  Its VJP uses the symmetry of the Hessian of
    ``Vt``: the VJP of a gradient map equals its JVP, which the adjoint
    (directional-derivative) passes compute — exactly the trick behind the
    reference's ``NeedlemanWunschFunctionBackward`` (deepblast/nw.py:342-386,
    after Mensch & Blondel 2018).  ``jax.grad`` therefore composes twice,
    which training requires (the loss differentiates through ``decode``).

Deviations from the reference (documented, intentional):

* The gap potential receives its *correct* gradient
  ``dVt/dA[i-1,j-1] = E[i,j] * (Qx[i,j] + Qy[i,j])``.  The reference returns
  the tensor ``A`` itself as its own gradient (deepblast/nw.py:337-339) and
  then discards it, so its gap head trains with zero gradient.
* The gap matrix is indexed per-cell ``A[i-1, j-1]`` (the reference CPU
  semantics, deepblast/nw.py:56-58) — not the CUDA rolling-row bug
  (deepblast/nw_cuda.py:61-63).
* Batches carry explicit per-pair lengths instead of per-pair Python slicing
  (reference: deepblast/alignment.py:165-169), keeping XLA shapes static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from deepblast_tpu import native
from deepblast_tpu.ops import dp_scan
from deepblast_tpu.ops.skew import skew, unskew

__all__ = [
    "alignment_score",
    "expected_alignment",
    "expected_alignment_stream",
    "traceback",
    "traceback_stream",
    "AlignmentDecoder",
    "NeedlemanWunschDecoder",
    "SmithWatermanDecoder",
    "get_backend",
    "register_backend",
]


# ---------------------------------------------------------------------------
# Backend registry: each backend provides the four skew-layout passes behind
# an *opaque-residual* interface (the residual ``aux`` that ``forward``
# returns is whatever the backend's reverse passes need — the scan oracle
# stores the soft-argmax streams, the batch-minor TPU backend stores the
# value stream and recomputes the soft-argmax flash-style):
#
#   skew(x) -> stream
#   unskew(stream, N, M, B) -> natural (B, N, M)
#   forward(th_s, A_s, ln, lm, mode=, operator=) -> (vt, aux)
#   backward(Et, aux, ln, lm, mode=, operator=, want_gap=)
#       -> (E_s, EA_s | None)            with EA = E * (Qx + Qy)
#   adjoint_forward(aux, Zt_s, Za_s, ln, lm, mode=, operator=)
#       -> (vtd, adj_aux)
#   adjoint_backward(E_s, aux, adj_aux, ln, lm, mode=, operator=)
#       -> (Ed_s, EdA_s)   with EdA = Ed * (Qx + Qy) + E * (Qdx + Qdy)
#
# "scan" is the portable lax.scan implementation; "pallas"/"pallas_bm"
# (registered by deepblast_tpu.ops.dp_pallas / dp_bm) are the TPU wavefront
# kernels.
# ---------------------------------------------------------------------------

def _xla_unskew(s, N, M, B):
    return unskew(s, N, M, offset=1)[:B]


def _gap_mul(E_s, aux_x, aux_y):
    K = E_s.shape[0]
    return E_s * (aux_x[:K].astype(E_s.dtype) + aux_y[:K].astype(E_s.dtype))


def _scan_backward(Et, aux, ln, lm, *, mode, operator, want_gap, nm=None):
    E = dp_scan.backward_scan(Et, aux, ln, lm, mode=mode)
    EA = _gap_mul(E, aux[0], aux[2]) if want_gap else None
    return E, EA


def _scan_adjoint_backward(E_s, aux, adj_aux, ln, lm, *, mode,
                           operator, nm=None):
    Ed = dp_scan.adjoint_backward_scan(E_s, aux, adj_aux, ln, lm, mode=mode)
    EdA = _gap_mul(Ed, aux[0], aux[2]) + _gap_mul(E_s, adj_aux[0],
                                                  adj_aux[2])
    return Ed, EdA


def _scan_with_dtypes(menu):
    """Storage-dtype menu support for the scan oracle (CPU gates).

    Only the ``d`` knob (difference-residual storage, the
    ``--dp-bf16-residuals`` flag) has scan-side numerics to emulate: the
    forward/adjoint-forward passes rebuild their soft-argmax diagonals
    from rounded transition-argument differences, matching what the
    batch-minor kernels' reverse passes reconstruct from their bf16 D
    streams.  ``stream``/``e`` are TPU stream-layout knobs with no scan
    counterpart and are ignored here (the scan oracle computes E
    densely in the input dtype)."""
    d = getattr(menu, "d", None)
    if d is None:
        return {}
    return {
        "forward": functools.partial(
            dp_scan.forward_scan, residual_dtype=d),
        "adjoint_forward": functools.partial(
            dp_scan.adjoint_forward_scan, residual_dtype=d),
    }


_BACKENDS = {
    "scan": {
        "skew": skew,
        "unskew": _xla_unskew,
        "forward": dp_scan.forward_scan,
        "backward": _scan_backward,
        "adjoint_forward": dp_scan.adjoint_forward_scan,
        "adjoint_backward": _scan_adjoint_backward,
        # host-side accessor into the backend's native E stream layout
        # (s[d, b, i] holds cell (i-1, d-i+1)): cell (i, j) -> s[i+j, b, i+1]
        "stream_cell": lambda s, b, i, j: s[i + j, b, i + 1],
        # affine view for the native C walk: flat offset of cell (i, j) is
        # (i+j)*B*S + b*S + (i+1) = i*(B*S+1) + j*B*S + (b*S+1)
        "stream_affine": lambda s, b: (
            np.ascontiguousarray(s).reshape(-1)[b * s.shape[2] + 1:],
            s.shape[1] * s.shape[2] + 1, s.shape[1] * s.shape[2]),
        "with_dtypes": _scan_with_dtypes,
    },
}

_DEFAULT_BACKEND = ["scan"]


def register_backend(name, fns, make_default=False):
    _BACKENDS[name] = fns
    if make_default:
        _DEFAULT_BACKEND[0] = name


def get_backend(name=None):
    if name is None:
        name = _DEFAULT_BACKEND[0]
    return name, _BACKENDS[name]


def set_default_backend(name):
    if name not in _BACKENDS:
        raise ValueError(f"unknown DP backend {name!r}")
    _DEFAULT_BACKEND[0] = name


# ---------------------------------------------------------------------------
# custom_vjp construction (cached per static configuration)
# ---------------------------------------------------------------------------

def _resolve_backend(be, dtypes):
    """Apply a per-call storage-dtype menu to a backend's functions.

    Backends that support storage-dtype menus register a ``with_dtypes``
    factory (dtypes -> dict of rebound functions); only keys already
    present are overridden, so runtime registry edits (env gates,
    decode_stream fallback pops) stay effective.  Backends without the
    factory ignore the menu — the scan oracle always computes in the
    input dtype (storage knobs are a TPU-stream concept)."""
    if dtypes is None or "with_dtypes" not in be:
        return be
    over = be["with_dtypes"](dtypes)
    return {**be, **{k: v for k, v in over.items() if k in be}}


@functools.lru_cache(maxsize=None)
def _build(mode: str, operator: str, backend: str, with_gap: bool = True,
           dtypes=None):
    # ``dtypes`` (a hashable dp_bm.DTypeMenu or None) is part of the cache
    # key: kernels traced under one storage-dtype menu can never serve a
    # same-config call with another menu.
    be = _resolve_backend(_BACKENDS[backend], dtypes)

    def _skewed(theta, A):
        # fused dual relayout when the backend has one (dp_bm: one
        # pallas_call for both potentials — two serialized calls measure
        # worse than the sum of their standalone times)
        if "skew_pair" in be:
            return be["skew_pair"](theta, A)
        return be["skew"](theta), be["skew"](A)

    def _run_forward(theta, A, ln, lm):
        thetad, Ad = _skewed(theta, A)
        return be["forward"](thetad, Ad, ln, lm, mode=mode, operator=operator)

    # -- level 2: the expected-alignment (gradient) map --------------------
    # ``with_gap`` also emits E_A = dVt/dA; the decode hot path skips it
    # (it is pure extra HBM traffic when only the alignment is consumed).
    @jax.custom_vjp
    def expected(theta, A, Et, lnf, lmf):
        out, _ = _expected_fwd(theta, A, Et, lnf, lmf)
        return out

    def _expected_fwd(theta, A, Et, lnf, lmf):
        B, N, M = theta.shape
        ln = lnf.astype(jnp.int32)
        lm = lmf.astype(jnp.int32)
        _, aux = _run_forward(theta, A, ln, lm)
        Ediag, EAdiag = be["backward"](Et, aux, ln, lm, mode=mode,
                                       operator=operator, want_gap=with_gap,
                                       nm=(N, M))
        # backends may return batch/lane-padded diagonal buffers
        E_theta = be["unskew"](Ediag, N, M, B)
        if with_gap:
            out = (E_theta, be["unskew"](EAdiag, N, M, B))
        else:
            out = E_theta
        return out, (aux, Ediag, Et, lnf, lmf)

    def _expected_bwd(res, cts):
        aux, Ediag, Et, lnf, lmf = res
        if with_gap:
            Zt, Za = cts
        else:
            Zt, Za = cts, None
        B, N, M = Zt.shape
        ln = lnf.astype(jnp.int32)
        lm = lmf.astype(jnp.int32)
        # cotangents are UNBOUNDED (arbitrary upstream loss scaling), so
        # they must not pass through a saturating fixed-point skew: use
        # the backend's float cotangent skew when it has one
        skew_ct = be.get("skew_ct", be["skew"])
        if Za is not None and "skew_ct_pair" in be:
            Ztd, ZAd = be["skew_ct_pair"](Zt, Za)
        else:
            Ztd = skew_ct(Zt)
            if Za is not None:
                ZAd = skew_ct(Za)
            elif be.get("za_none"):
                # with_gap=False (the training decode path): the gap
                # cotangent is identically zero, and the backend's
                # adjoint_forward accepts za=None — it drops the Za
                # stream from the kernel instead of materialising and
                # streaming a zeros tensor
                ZAd = None
            else:
                ZAd = jnp.zeros_like(Ztd)
        # Hessian symmetry: VJP of the gradient map == JVP along (Zt, Za).
        vtd, adj_aux = be["adjoint_forward"](
            aux, Ztd, ZAd, ln, lm, mode=mode, operator=operator, nm=(N, M))
        Eddiag, EdAdiag = be["adjoint_backward"](
            Ediag, aux, adj_aux, ln, lm, mode=mode, operator=operator,
            nm=(N, M))
        g_theta = be["unskew"](Eddiag, N, M, B)
        g_A = be["unskew"](EdAdiag, N, M, B)
        # E is linear in Et, so d<cts, E>/dEt = <cts, E>/Et = vtd (the
        # adjoint-forward terminal tangent is Et-free).
        return (g_theta, g_A, vtd,
                jnp.zeros_like(lnf), jnp.zeros_like(lmf))

    expected.defvjp(_expected_fwd, _expected_bwd)

    # -- level 1: the terminal score ---------------------------------------
    @jax.custom_vjp
    def score(theta, A, lnf, lmf):
        ln = lnf.astype(jnp.int32)
        lm = lmf.astype(jnp.int32)
        if "forward_score" in be:
            # score-only kernel: no residual-stream writes.  Safe here
            # because this primal has no reverse consumer — when score IS
            # differentiated, _score_bwd recomputes through `expected`
            # (whose forward writes the streams); XLA could never DCE the
            # stores out of the full kernel's single pallas_call itself.
            thetad, Ad = _skewed(theta, A)
            return be["forward_score"](thetad, Ad, ln, lm, mode=mode,
                                       operator=operator)
        vt, _ = _run_forward(theta, A, ln, lm)
        return vt

    def _score_fwd(theta, A, lnf, lmf):
        return score(theta, A, lnf, lmf), (theta, A, lnf, lmf)

    def _score_bwd(res, Et):
        theta, A, lnf, lmf = res
        g_theta, g_A = expected(theta, A, Et, lnf, lmf)
        return (g_theta, g_A, jnp.zeros_like(lnf), jnp.zeros_like(lmf))

    score.defvjp(_score_fwd, _score_bwd)

    return score, expected


def _lengths(theta, lengths):
    B, N, M = theta.shape
    if lengths is None:
        ln = jnp.full((B,), N, theta.dtype)
        lm = jnp.full((B,), M, theta.dtype)
    else:
        ln, lm = lengths
        ln = jnp.asarray(ln).astype(theta.dtype)
        lm = jnp.asarray(lm).astype(theta.dtype)
    return ln, lm


def alignment_score(theta, A, lengths=None, *, mode="nw",
                    operator="softmax", backend=None, dtypes=None):
    """Terminal smoothed alignment score ``Vt`` for a padded batch.

    Parameters
    ----------
    theta : (B, N, M) match potentials.
    A : (B, N, M) per-cell gap potentials.
    lengths : optional tuple of (B,) arrays ``(ln, lm)`` of true lengths.
    dtypes : optional per-call storage-dtype menu (dp_bm.DTypeMenu) for
        backends that support one; part of the kernel cache key.
    """
    backend, _ = get_backend(backend)
    score, _ = _build(mode, operator, backend, True, dtypes)
    ln, lm = _lengths(theta, lengths)
    return score(theta, A, ln, lm)


def expected_alignment(theta, A, lengths=None, Et=None, *, mode="nw",
                       operator="softmax", backend=None, return_gap=False,
                       dtypes=None):
    """Expected (posterior marginal) alignment matrix — ``decode``.

    Differentiable (twice) w.r.t. ``theta`` and ``A``.  With
    ``return_gap=True`` also returns the expected gap-potential usage
    ``E_A = dVt/dA``.
    """
    backend, _ = get_backend(backend)
    _, expected = _build(mode, operator, backend, bool(return_gap), dtypes)
    ln, lm = _lengths(theta, lengths)
    if Et is None:
        Et = jnp.ones((theta.shape[0],), theta.dtype)
    if return_gap:
        return expected(theta, A, Et, ln, lm)
    return expected(theta, A, Et, ln, lm)


def expected_alignment_stream(theta, A, lengths=None, Et=None, *, mode="nw",
                              operator="softmax", backend=None, dtypes=None):
    """Expected alignment in the backend's *native stream layout* — the
    inference/traceback hot path.

    Skips the unskew relayout (~15% of decode HBM traffic on the TPU
    backend): :func:`traceback_stream` walks the stream directly on host,
    so nothing in the inference path ever needs the natural ``(B, N, M)``
    form.  The reference has no analogue relayout to begin with (its CUDA
    kernel is one serial thread per pair, deepblast/nw_cuda.py:46-79) —
    this keeps the TPU wavefront layout's cost out of the path that
    doesn't need to pay it.

    Inference-only: NOT differentiable (the custom_vjp wiring lives on
    :func:`expected_alignment`).  Requires a backend that registers a
    ``stream_cell`` accessor ("scan", "pallas_bm")."""
    backend, be = get_backend(backend)
    if "stream_cell" not in be and "decode_stream" not in be:
        raise ValueError(f"backend {backend!r} has no stream-layout "
                         "accessor; use expected_alignment")
    be = _resolve_backend(be, dtypes)
    ln, lm = _lengths(theta, lengths)
    ln = ln.astype(jnp.int32)
    lm = lm.astype(jnp.int32)
    if Et is None:
        Et = jnp.ones((theta.shape[0],), theta.dtype)
    B, N, M = theta.shape
    if "decode_stream" in be:
        # phase-split triangle-windowed decode (see dp_bm.decode_stream_bm)
        return be["decode_stream"](theta, A, ln, lm, Et,
                                   mode=mode, operator=operator)
    if "skew_pair" in be:
        thd, Ad = be["skew_pair"](theta, A)
    else:
        thd, Ad = be["skew"](theta), be["skew"](A)
    _, aux = be["forward"](thd, Ad, ln, lm, mode=mode, operator=operator)
    Ediag, _ = be["backward"](Et, aux, ln, lm, mode=mode, operator=operator,
                              want_gap=False, nm=(N, M))
    return Ediag


# ---------------------------------------------------------------------------
# Traceback (host-side greedy walk; reference: deepblast/nw.py:401-444)
# ---------------------------------------------------------------------------

def traceback(grad):
    """Greedy argmax walk over an expected-alignment matrix.

    ``grad`` is a single pair's (N, M) matrix (numpy or jax array), already
    sliced to true lengths.  Returns a list of ``(i, j, state)`` tuples with
    states (x, m, y) = (0, 1, 2), identical to the reference walk including
    its tie-breaking order (left, diag, up) and trailing-gap padding.

    Documented deviation: the diagonal move is disabled when *either* index
    is at the border.  The reference guards it with ``i <= 0 and j <= 0``
    (deepblast/nw.py:423), so at ``i == 0, j > 0`` it reads
    ``grad[-1, j-1]`` — the tensor wraps to the *last* row and the walk can
    leave the matrix (observable on the reference's own ``dm.txt`` fixture,
    whose test is CUDA-gated and never ran: tests/test_nw_cuda.py:79-89).
    """
    grad = np.ascontiguousarray(np.asarray(grad))
    if grad.dtype in (np.float32, np.float64):
        states = native.traceback_affine(grad, grad.shape[1], 1,
                                         grad.shape[0], grad.shape[1])
        if states is not None:
            return states
    return _traceback_walk(lambda i, j: grad[i, j], *grad.shape)


def _traceback_walk(get, N, M):
    """The greedy walk itself, over a cell accessor ``get(i, j)`` — shared
    by the natural-layout and stream-layout entry points."""
    m, x, y = 1, 0, 2
    i, j = N - 1, M - 1
    states = [(i, j, m)]
    neg = -100000.0
    while True:
        left = neg if i <= 0 else get(i - 1, j)
        diag = neg if (i <= 0 or j <= 0) else get(i - 1, j - 1)
        upper = neg if j <= 0 else get(i, j - 1)
        if left == neg and diag == neg and upper == neg:
            break
        ij = int(np.argmax([left, diag, upper]))
        if ij == 0:
            i, s = i - 1, x
        elif ij == 1:
            i, j, s = i - 1, j - 1, m
        else:
            j, s = j - 1, y
        states.append((i, j, s))
    while i > 0:
        i -= 1
        states.append((i, j, x))
    while j > 0:
        j -= 1
        states.append((i, j, y))
    return states[::-1]


def traceback_stream(stream, n, m, b=0, *, backend=None):
    """Greedy traceback directly from a backend-native expected-alignment
    stream (:func:`expected_alignment_stream`), for pair ``b`` with true
    lengths ``(n, m)``.  The walk touches O(n+m) cells, so the layout
    remap happens per visited cell on host — no device-side unskew.
    Identical output to ``traceback(unskew(stream)[b, :n, :m])``
    (test-covered)."""
    _, be = get_backend(backend)
    stream = jax.tree_util.tree_map(np.asarray, stream)
    if isinstance(stream, dict):
        # phase-segmented decode layout (dp_bm.decode_stream_bm); the C
        # walk handles f32 and raw int16 fixed-point segments directly
        # (comparison-only walk, monotone quantization)
        states = native.traceback_segmented(
            list(stream["seg"]), stream["row0"], stream["w0"], b, n, m)
        if states is not None:
            return states
    elif "stream_affine" in be and stream.dtype in (np.float32, np.float64):
        flat, si, sj = be["stream_affine"](stream, b)
        states = native.traceback_affine(flat, si, sj, n, m)
        if states is not None:
            return states
    if "stream_accessor" in be:
        acc = be["stream_accessor"](stream, n, m)
        return _traceback_walk(lambda i, j: acc(b, i, j), n, m)
    cell = be["stream_cell"]
    return _traceback_walk(lambda i, j: float(cell(stream, b, i, j)), n, m)


# ---------------------------------------------------------------------------
# Decoder façade mirroring the reference nn.Module API
# (reference: deepblast/nw.py:389-458, deepblast/sw.py:316-384)
# ---------------------------------------------------------------------------

class AlignmentDecoder:
    """Callable façade bundling score / decode / traceback for one mode."""

    mode = "nw"

    def __init__(self, operator="softmax", backend=None):
        self.operator = operator
        self.backend = backend

    def __call__(self, theta, A, lengths=None):
        return alignment_score(theta, A, lengths, mode=self.mode,
                               operator=self.operator, backend=self.backend)

    forward = __call__

    def decode(self, theta, A, lengths=None, Et=None, return_gap=False):
        return expected_alignment(theta, A, lengths, Et, mode=self.mode,
                                  operator=self.operator,
                                  backend=self.backend,
                                  return_gap=return_gap)

    @staticmethod
    def traceback(grad):
        return traceback(grad)


class NeedlemanWunschDecoder(AlignmentDecoder):
    mode = "nw"


class SmithWatermanDecoder(AlignmentDecoder):
    mode = "sw"
