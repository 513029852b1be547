"""Pure extraction kernels.

Every kernel is a deterministic pure function of the span payload bytes —
the property that makes output independent of partitioning (SURVEY.md §7
"hard parts" (a)). Spark never appears in this package; the pipeline layer
wraps these in Arrow-batched pandas UDFs.
"""
