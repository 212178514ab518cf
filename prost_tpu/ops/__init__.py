"""Hand-fused Pallas kernels for hot paths.

The generic solver path is pure XLA (jnp inside lax.while_loop) and works
for every problem; these kernels are speed-of-light specializations for
the dominant workload shapes (imaging problems on gradient operators),
selected automatically when the problem structure matches.
"""

from .fused_admm import FusedROFADMM
from .fused_deblur import match_deblur_structure
from .fused_multilabel import match_multilabel_structure
from .fused_rof import FusedROFPDHG, match_rof_structure
from .fused_tight import match_tight_structure

__all__ = [
    "FusedROFADMM",
    "FusedROFPDHG",
    "match_rof_structure",
    "match_multilabel_structure",
    "match_deblur_structure",
    "match_tight_structure",
]
