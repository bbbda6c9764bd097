from deepblast_tpu.ops.dp import (  # noqa: F401
    AlignmentDecoder,
    NeedlemanWunschDecoder,
    SmithWatermanDecoder,
    alignment_score,
    expected_alignment,
    traceback,
)
from deepblast_tpu.ops.smooth import OPERATORS  # noqa: F401

# Register the Pallas TPU backend (becomes the default on TPU hosts).
from deepblast_tpu.ops import dp_pallas as _dp_pallas

_dp_pallas.register()
