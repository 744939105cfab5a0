"""HTTP binding for :class:`~priority_data_pipeline_postgres_db_spark.api.EngineApi` —
the reference's 8 Flask routes (app.py:65-264) bound 1:1 over the
framework-free facade.

Each route is one line of dispatch into ``EngineApi``; the engine stays a
library and this module is the only place that imports Flask (guarded —
the package imports fine without it).  Reference contracts kept:

- routes that need a config take a JSON body with a ``datasourceId`` key
  (the ``getExtractionconfig`` decorator, app.py:33-59) and fail with the
  same ``error message`` JSON + 400 without it,
- lifecycle POST responses are wrapped ``{<endpoint>: result}``
  (app.py:189,247,264),
- ``/refreshData`` reads ``?incremental=`` defaulting to true —
  but parsed STRICTLY (``api.parse_bool``; the reference's substring test
  ``value.lower() in 'true'`` accepts 't', 'ru', '' — SURVEY.md §2.9) and
  answers 400 on garbage instead of silently loading full.
"""

from __future__ import annotations

from .api import EngineApi


def create_app(api: EngineApi):
    """Build the Flask app over an EngineApi.  Import-guarded: raises a
    clear ImportError naming the optional dependency if Flask is absent."""
    try:
        from flask import Flask, jsonify, request
    except ImportError as ex:  # pragma: no cover
        raise ImportError(
            "the HTTP binding needs flask (optional dependency); "
            "use EngineApi directly for the library surface"
        ) from ex

    app = Flask("priority_data_pipeline_postgres_db_spark")

    _MISSING_ID = {
        "error message": "The request must include a JSON with a datasourceId key"
    }

    def _datasource_id():
        body = request.get_json(silent=True)
        if not body or "datasourceId" not in body:
            return None
        return body["datasourceId"]

    # GET /info (app.py:76-85)
    @app.get("/info")
    def info():
        return jsonify(api.info())

    # GET /pingApi (app.py:88-118)
    @app.get("/pingApi")
    def ping_api():
        return jsonify(api.ping())

    # GET /testExtractionconfigEntities (app.py:65-71)
    @app.get("/testExtractionconfigEntities")
    def test_entities():
        return jsonify(api.test_entities())

    # GET /extractionConfig (app.py:124-130)
    @app.get("/extractionConfig")
    def get_extraction_config():
        dsid = _datasource_id()
        if dsid is None:
            return jsonify(_MISSING_ID), 400
        try:
            return jsonify(api.get_extraction_config(dsid))
        except KeyError:
            return jsonify({"error message": f"no extraction config for {dsid!r}"}), 404

    # POST /extractionConfig (app.py:135-141) — body is the config document
    @app.post("/extractionConfig")
    def post_extraction_config():
        body = request.get_json(silent=True)
        if not body or "datasourceId" not in body:
            return jsonify(_MISSING_ID), 400
        cfg = {k: v for k, v in body.items() if k != "datasourceId"}
        return jsonify(api.post_extraction_config(cfg, body["datasourceId"]))

    # POST /initialDataLoad (app.py:146-189)
    @app.post("/initialDataLoad")
    def initial_data_load():
        if _datasource_id() is None:
            return jsonify(_MISSING_ID), 400
        return jsonify({"initialDataLoad": api.initial_data_load()})

    # POST /resetDataPlatform (app.py:194-247)
    @app.post("/resetDataPlatform")
    def reset_data_platform():
        if _datasource_id() is None:
            return jsonify(_MISSING_ID), 400
        return jsonify({"resetDataPlatform": api.reset_data_platform()})

    # POST /refreshData?incremental= (app.py:251-264)
    @app.post("/refreshData")
    def refresh_data():
        if _datasource_id() is None:
            return jsonify(_MISSING_ID), 400
        raw = request.args.get("incremental", default="true")
        try:
            report = api.refresh_data(raw)
        except ValueError as ex:
            return jsonify({"error message": str(ex)}), 400
        return jsonify({"refreshData": report})

    return app
