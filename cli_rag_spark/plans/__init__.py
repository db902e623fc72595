"""Named query plans — the engine's judged surface.

Each ``queries_*`` module exposes two dicts keyed by query name:

* ``QUERIES``: name -> Callable[(SparkSession, sf_dir str), DataFrame]
* ``ORACLE``:  name -> equivalent DuckDB SQL over the fixture views
               (omitted entries degrade to rows-only checks).

``registry.all_queries()/all_oracles()`` merge them for
``__spark_entry__.py``. Column names AND types are aligned with the
oracle on both sides; float results are rounded (6 dp for distances,
2-4 dp for money aggregates) so the driver's value-hash is stable
across engines.
"""
