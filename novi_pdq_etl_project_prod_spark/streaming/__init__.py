"""Structured Streaming surface (SURVEY.md §2.8, §7.2 M6 stretch).

The reference is strictly batch (month-at-a-time, manually triggered);
its delete+append month reload is the batch analogue of late-data upsert.
This package supplies the streaming twin: event-time windowed aggregation
with watermarks over the ``events`` fixture shape, plus a custom stateful
sessionization operator.
"""

from novi_pdq_etl_project_prod_spark.streaming.events import (  # noqa: F401
    EVENTS_SCHEMA,
    monthly_event_rollup,
    read_event_stream,
    windowed_event_counts,
)
