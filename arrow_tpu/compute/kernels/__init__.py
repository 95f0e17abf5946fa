"""Hand-written Pallas/Mosaic kernels — the TPU "device code" tier.

≙ the reference's WGSL compute shaders (SURVEY.md §2 ⚙ rows).  The elementwise
tier normally lowers to fused XLA (which already matches hand-written kernels
for streaming ops); these kernels exist where explicit control of VMEM/DMA or
grid sequencing buys something XLA cannot express:

- reduction.py: grid tree-reduction (≙ `arithmetic/compute_shaders/f32/
  aggregate.wgsl` workgroup shared-memory reduce)
- elementwise.py: streaming fused op+validity kernel template (≙ one WGSL
  binary shader + the null-merge pass, in one VMEM round-trip)
- compaction.py: block filter writing variable-length compacted blocks at
  dynamic offsets, exploiting the TPU grid's sequential execution order
"""

from .elementwise import binary_op_pallas, unary_op_pallas
from .reduction import sum_pallas

__all__ = ["binary_op_pallas", "sum_pallas", "unary_op_pallas"]
