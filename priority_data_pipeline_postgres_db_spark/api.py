"""HTTP-API facade — the reference's 8 endpoints as plain functions
(SURVEY.md §2.8; app.py routes), framework-free.

Any web layer (Flask, FastAPI) binds these 1:1; the engine stays a
library.  Reference quirks deliberately fixed (SURVEY.md §2.9):

- ``incremental`` is a STRICT boolean parse — the reference's
  ``value.lower() in 'true'`` substring test accepts 't', 'ru', '' as
  True (app.py:258),
- requests without ``datasourceId`` fail with a clear error (the
  decorator contract, app.py:33-59).
"""

from __future__ import annotations

from typing import Any

from .plans.pipeline import Pipeline
from .sources.control import ControlStore


def parse_bool(value: Any) -> bool:
    """Strict boolean parse (fixes app.py:258's substring quirk)."""
    if isinstance(value, bool):
        return value
    if isinstance(value, str) and value.lower() in ("true", "false"):
        return value.lower() == "true"
    raise ValueError(f"incremental must be 'true' or 'false', got {value!r}")


class EngineApi:
    """Endpoint behaviors over a Pipeline + ControlStore."""

    def __init__(self, pipeline: Pipeline, control: ControlStore, info: dict | None = None):
        self.pipeline = pipeline
        self.control = control
        self._info = info or {}

    # GET /info (app.py:76-85)
    def info(self) -> dict:
        return dict(self._info)

    # GET /pingApi (app.py:88-118): control store + warehouse + source probe
    def ping(self) -> dict:
        checks = {"controlStore": True}
        try:
            self.control.latest_config(self.pipeline.datasource_id)
        except Exception:  # noqa: BLE001
            checks["controlStore"] = False
        probe = self.pipeline.test_extraction_entities()
        checks["source"] = all(r.get("ok") for r in probe)
        checks["warehouse"] = isinstance(self.pipeline.warehouse.tables(), list)
        return checks

    # GET /extractionConfig (app.py:124-130)
    def get_extraction_config(self, datasource_id: str) -> dict:
        if not datasource_id:
            raise ValueError("datasourceId is required")
        cfg = self.control.latest_config(datasource_id)
        if cfg is None:
            raise KeyError(datasource_id)
        return cfg

    # POST /extractionConfig (app.py:135-141)
    def post_extraction_config(self, cfg: dict, datasource_id: str) -> dict:
        if not datasource_id:
            raise ValueError("datasourceId is required")
        return self.control.insert_config(cfg, datasource_id=datasource_id)

    # GET /testExtractionconfigEntities (app.py:65-71)
    def test_entities(self) -> list[dict]:
        return self.pipeline.test_extraction_entities()

    # POST /initialDataLoad (app.py:146-189)
    def initial_data_load(self) -> dict:
        return self.pipeline.initial_data_load()

    # POST /resetDataPlatform (app.py:194-247)
    def reset_data_platform(self) -> dict:
        return self.pipeline.reset_data_platform()

    # POST /refreshData?incremental= (app.py:251-264)
    def refresh_data(self, incremental: Any = "true") -> dict:
        report = self.pipeline.refresh_data(parse_bool(incremental))
        return {
            "extractionID": report.extraction_id,
            "stgDataWritten": [vars(r) for r in report.stg_data_written],
            "errors": report.errors,
        }
