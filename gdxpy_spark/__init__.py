"""gdxpy_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``jackjackk/gdxpy`` (a
pandas-oriented loader for GAMS GDX optimization-model data), rebuilt
Spark-first per SURVEY.md.

Layout
------
- ``registry``   — declarative query/oracle registry (the SURVEY §2.2 inventory)
- ``tables``     — canonical loaders for the driver test tables
- ``session``    — SparkSession builder tuned for local + cluster use
- ``operators/`` — relational operator inventory (scans, filters, joins,
                   aggregates, windows, set ops, GDX composites, LLM ops)
- ``functions/`` — scalar-function surface incl. GDX special-value semantics
- ``sources/``   — GDX binary codec + Spark Python DataSource ("gdx")
- ``streaming/`` — Structured Streaming operators over the events table
- ``api``        — GdxEngine facade (gdxpy's gload/GdxFile surface, Spark-native)

Reference provenance: /root/reference was EMPTY at survey time (SURVEY.md §0);
semantics are reconstructed from the public GAMS GDX data model and the
public jackjackk/gdxpy API. No code is copied from any reference.
"""

__version__ = "0.1.0"
