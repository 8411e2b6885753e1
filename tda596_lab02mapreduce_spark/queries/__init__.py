"""Oracle-checked query inventory (SURVEY.md §2).

Importing this package populates the registry; each module covers one
band of the §2B capability matrix / §2C extensions.
"""

from tda596_lab02mapreduce_spark.queries import (  # noqa: F401
    advanced,
    aggregates,
    association,
    driftstats,
    joins,
    llm_pipeline,
    multimodal,
    relational,
    scalars,
    setops,
    sinks,
    statml,
    streaming_batch,
    survival,
    textprep,
    timeseries,
    tpch_extra,
    trainprep,
    udfs,
    windows,
    wordcount,
)
