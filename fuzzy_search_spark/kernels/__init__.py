"""Pure-Python/NumPy kernels — zero Spark dependencies, unit-testable.

These implement, from scratch, the scoring and skipgram semantics the
reference library defines (see SURVEY.md §2.2); they are the hot inner loops
executed inside Arrow-batched pandas UDFs on Spark executors.
"""
