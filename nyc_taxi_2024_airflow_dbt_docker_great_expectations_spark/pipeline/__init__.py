"""Control plane (SURVEY.md section 2.10): run ledger, retries, alerting,
and the pipeline runner replacing the Airflow DAG."""

from .ledger import Ledger  # noqa: F401
from .runner import PipelineRunner, Stage  # noqa: F401
