"""DataFrame-level operator library.

These are the genuinely *custom* algorithms of the engine (SURVEY.md §4:
no custom Catalyst rules are needed — everything else compiles to stock
operators): SCD2 merge, as-of join, dedup/similarity kit, QA gates.
All are pure DataFrame compositions — they inherit Catalyst optimization,
AQE, and whole-stage codegen for free.
"""
