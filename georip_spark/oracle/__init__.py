"""Single-node pandas oracle mirroring the reference's semantics.

The reference ships zero tests (SURVEY.md §5); this package is the
behavioral oracle the engine is tested against: imperative loops in
reference order (georip/raster/tools.py:255-262 tiling,
georip/geoprocessing/mapping.py nested-loop matching), sharing only
the low-level numpy geometry kernels with the engine (those are
unit-tested independently). Used exclusively at sf-tiny in pytest.
"""
