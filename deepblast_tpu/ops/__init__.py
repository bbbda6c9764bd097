from deepblast_tpu.ops.dp import (  # noqa: F401
    AlignmentDecoder,
    NeedlemanWunschDecoder,
    SmithWatermanDecoder,
    alignment_score,
    expected_alignment,
    traceback,
)
from deepblast_tpu.ops.smooth import OPERATORS  # noqa: F401

# Register the Pallas TPU backends.  The batch-minor backend registers
# second and becomes the default on TPU hosts (round-2 layout; see
# docs/PERF_NOTES.md); the round-1 diagonal-major backend stays available
# as "pallas".
from deepblast_tpu.ops import dp_bm as _dp_bm
from deepblast_tpu.ops import dp_pallas as _dp_pallas

_dp_pallas.register(make_default=False)
_dp_pallas.register_long()
_dp_bm.register()
