"""ds_jedai_spark — a PySpark-native holistic geospatial interlinking engine.

A from-scratch re-expression of the capabilities of AI-team-UoA/DS-JedAI
(reference surveyed in SURVEY.md) as idiomatic PySpark: DataFrame/SQL plans
optimized by Catalyst, tile-grid spatial joins as exploded equi-joins,
DE-9IM verification as closed-form column expressions (box/point fast path)
or vectorized pandas UDFs (general path), and budget-bounded progressive
modes as window/top-k plans.

Everything here derives from public knowledge only: the Apache Spark API,
the reference repo's observable behavior, and published papers (GIA.nt /
progressive interlinking, WWW'21).
"""

__version__ = "0.1.0"
