"""Pipeline runner — the Airflow DAG re-expressed as a driver program
(reference O1, O4-O7: ``dags/nyc_taxi_pipeline.py:22-27,234-242``).

Stage graph (same barrier semantics as the reference's task graph):
staging load -> bronze(run, tests, validate) -> silver(...) -> gold(...) ->
finalize.  A quality-gate failure raises and halts everything downstream;
retries with delay wrap each stage; an alert hook fires on terminal failure
(the reference posts a Slack webhook, ``dags/failure_callbacks.py:31-52``).
"""

from __future__ import annotations

import json
import logging
import time
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

logger = logging.getLogger("nyc_taxi_spark.pipeline")

DEFAULT_RETRIES = 3        # reference dags/nyc_taxi_pipeline.py:24
DEFAULT_RETRY_DELAY = 60.0  # reference dags/nyc_taxi_pipeline.py:25 (1 min)


def slack_alert(webhook_url: str, pipeline: str, stage: str, error: str) -> None:
    """O5: Slack webhook failure alert (reference dags/failure_callbacks.py:31-52);
    error truncated to 500 chars (failure_callbacks.py:18)."""
    payload = {
        "text": f":red_circle: pipeline `{pipeline}` stage `{stage}` failed: "
                f"{str(error)[:500]}"
    }
    req = urllib.request.Request(
        webhook_url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    urllib.request.urlopen(req, timeout=10)


@dataclass
class Stage:
    name: str
    fn: Callable[[dict], object]   # receives the shared context dict (O6: XCom)
    retries: int = DEFAULT_RETRIES
    retry_delay: float = DEFAULT_RETRY_DELAY


@dataclass
class PipelineRunner:
    name: str
    stages: list[Stage] = field(default_factory=list)
    alert_hook: Callable[[str, str, str], None] | None = None
    sleep: Callable[[float], None] = time.sleep  # injectable for tests

    def add(self, name: str, fn: Callable[[dict], object], **kw) -> "PipelineRunner":
        self.stages.append(Stage(name, fn, **kw))
        return self

    def run(self, select: list[str] | None = None,
            exclude: list[str] | None = None) -> dict:
        """Execute stages in order.  ``select``/``exclude`` mirror dbt node
        selection (reference O7).  Stage return values accumulate in a context
        dict keyed by stage name — the XCom replacement (O6)."""
        context: dict = {}
        for stage in self.stages:
            if select is not None and stage.name not in select:
                continue
            if exclude is not None and stage.name in exclude:
                continue
            attempt = 0
            while True:
                attempt += 1
                try:
                    logger.info("stage %s attempt %d", stage.name, attempt)
                    context[stage.name] = stage.fn(context)
                    break
                except Exception as exc:  # noqa: BLE001 — O4 retry semantics
                    if attempt > stage.retries:
                        logger.error("stage %s failed terminally: %s", stage.name, exc)
                        if self.alert_hook is not None:
                            try:
                                self.alert_hook(self.name, stage.name, str(exc))
                            except Exception:  # alert failure must not mask
                                logger.exception("alert hook failed")
                        raise
                    logger.warning("stage %s attempt %d failed: %s; retrying",
                                   stage.name, attempt, exc)
                    self.sleep(stage.retry_delay)
        return context
