"""Hand-written Pallas/Mosaic kernels — the TPU "device code" tier.

≙ the reference's WGSL compute shaders (SURVEY.md §2 ⚙ rows).  The elementwise
and reduction tiers lower to fused XLA programs (measured on the v5e to match
or beat hand kernels for streaming ops — see docs/kernels.md "retired
kernels"); Pallas is reserved for what XLA cannot express:

- compaction*.py: block filter writing variable-length compacted blocks at
  dynamic offsets, exploiting the TPU grid's sequential execution order
- merge.py: streaming pairwise-merge sort passes (runtime run lengths)
- segscan.py: streaming segmented scans
- groupby_mxu.py: one-hot MXU scatter-add aggregation
"""
