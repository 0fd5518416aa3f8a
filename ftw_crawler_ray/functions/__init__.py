"""Pure (no-Ray) scalar/column kernels.

Every function here is deterministic and picklable so it can run
inside ``map_batches`` workers. Semantics are pinned against the
reference test-suite facts (SURVEY.md §5) — byte-identical output is
the invariant, the implementations are new.
"""
