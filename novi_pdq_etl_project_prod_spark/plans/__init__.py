"""Pipeline plans: the reference's Airflow DAG re-expressed as plain
function composition over the medallion layers (SURVEY.md §2.9 G1-G4).
"""

from novi_pdq_etl_project_prod_spark.plans.pipeline import (  # noqa: F401
    PipelineResult,
    run_monthly_pipeline,
)
