"""JSON-config loader + action dispatcher — the reference component's
outermost contract, so a reference user's ``config.json`` drives this
engine unchanged.

Parity map (all reference evidence):

- Config shape: Keboola's ``config.json`` carries the component params
  under ``parameters`` and the action under ``action``
  (``keboola.component.base.ComponentBase`` contract; parameters model:
  ``components/ex-iceberg/src/configuration.py:12-56``,
  ``components/wr-iceberg/src/configuration.py:12-35``). The secret token
  field is aliased ``#token`` (``common/src/configuration.py:4-8``).
- Dispatch: ``configuration.action`` → ``run()`` or a ``@sync_action``
  (``ex-iceberg/src/component.py:168-178``).
- Exit codes: ``UserException`` → 1, any other exception → 2, success → 0
  (``ex-iceberg/src/component.py:171-178``). Here the user-error class is
  :class:`UserConfigError` / :class:`UserDataError`.
- Writer input discovery: the reference reads its input table + manifest
  from the Keboola data dir (``wr-iceberg/src/component.py:60-77``);
  :func:`_discover_csv_input` reads the same ``in/tables/*.csv`` +
  ``*.csv.manifest`` layout.

The reference's ``duckdb_max_memory_mb`` / ``debug`` knobs are accepted
and ignored: there is no bounded-memory staging area to size — the Spark
plan streams distributed and spills under its own memory manager.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

from pyspark.sql import SparkSession

from component_iceberg_spark.component import run_extractor, run_writer, sync_action
from component_iceberg_spark.config import (
    CatalogConfig,
    CsvInput,
    DataSelection,
    ExtractorConfig,
    ExtractorDestination,
    Source,
    UserConfigError,
    WriterConfig,
    WriterDestination,
)
from component_iceberg_spark.typebridge import UserDataError

SYNC_ACTIONS = (
    "list_namespaces",
    "list_tables",
    "list_snapshots",
    "list_columns",
    "list_table_columns",
)


def _catalog_from_params(params: dict[str, Any]) -> CatalogConfig:
    cat = params.get("catalog", {})
    if not isinstance(cat, dict):
        raise UserConfigError("catalog block must be an object")
    return CatalogConfig(
        name=cat.get("name", "local"),
        warehouse=cat.get("warehouse", ""),
        uri=cat.get("uri") or None,
        # pydantic alias parity: the secret arrives as "#token"
        token=cat.get("#token") or cat.get("token") or None,
    )


def load_extractor_config(params: dict[str, Any]) -> ExtractorConfig:
    """``parameters`` JSON → :class:`ExtractorConfig` (field-for-field with
    ``ex-iceberg/src/configuration.py:28-56``)."""
    src = params.get("source", {})
    sel = params.get("data_selection", {})
    dst = params.get("destination", {})
    return ExtractorConfig(
        catalog=_catalog_from_params(params),
        source=Source(
            namespace=src.get("namespace", ""),
            table_name=src.get("table_name", ""),
            snapshot_id=src.get("snapshot_id"),
        ),
        data_selection=DataSelection(
            mode=sel.get("mode", "all_data"),
            columns=list(sel.get("columns", [])),
        ),
        destination=ExtractorDestination(
            parquet_output=bool(dst.get("parquet_output", False)),
            file_name=dst.get("file_name", "output") or "output",
            table_name=dst.get("table_name", "output") or "output",
            load_type=dst.get("load_type", "full_load"),
            primary_key=list(dst.get("primary_key", [])),
            preserve_insertion_order=bool(
                dst.get("preserve_insertion_order", True)
            ),
        ),
        limit=int(params.get("limit", 100_000)),
        custom_query=params.get("custom_query") or None,
    )


def load_writer_config(
    params: dict[str, Any], data_dir: str | None = None
) -> WriterConfig:
    """``parameters`` JSON → :class:`WriterConfig` (field-for-field with
    ``wr-iceberg/src/configuration.py:24-35``), discovering the input
    table from the data dir's ``in/tables/`` like the reference does."""
    dst = params.get("destination", {})
    cfg = WriterConfig(
        catalog=_catalog_from_params(params),
        destination=WriterDestination(
            namespace=dst.get("namespace", ""),
            table_name=dst.get("table_name", ""),
            mode=dst.get("mode", "replace"),
            primary_key=list(dst.get("primary_key", [])),
            partition_by=list(dst.get("partition_by", [])),
            preserve_insertion_order=bool(
                dst.get("preserve_insertion_order", True)
            ),
            all_varchar=bool(dst.get("all_varchar", False)),
        ),
    )
    if data_dir is not None:
        csv_in, parquet_in = _discover_input(data_dir)
        cfg.input_csv = csv_in
        cfg.input_parquet = parquet_in
    return cfg


def _discover_input(data_dir: str) -> tuple[CsvInput | None, str | None]:
    """Keboola data-dir contract: the input table is ``in/tables/<name>``
    with an optional ``<name>.manifest`` JSON describing columns/dialect
    (``wr-iceberg/src/component.py:60-77``). Parquet inputs (the
    reference's TODO) are recognized by extension."""
    tables_dir = os.path.join(data_dir, "in", "tables")
    if not os.path.isdir(tables_dir):
        raise UserConfigError(f"no input tables dir: {tables_dir}")
    entries = sorted(
        e for e in os.listdir(tables_dir) if not e.endswith(".manifest")
    )
    if not entries:
        raise UserConfigError("no input table in data dir")
    name = entries[0]
    path = os.path.join(tables_dir, name)
    if name.endswith(".parquet") or (
        os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )
    ):
        return None, path
    manifest: dict[str, Any] = {}
    mpath = path + ".manifest"
    if os.path.isfile(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    columns = list(manifest.get("columns", []))
    if not columns:
        # headered CSV: names come from the file itself
        with open(path if os.path.isfile(path) else os.path.join(
            path, sorted(os.listdir(path))[0]
        )) as f:
            header = f.readline().strip("\r\n")
        delim = manifest.get("delimiter", ",")
        columns = [c.strip('"') for c in header.split(delim)]
    return (
        CsvInput(
            path=path,
            columns=columns,
            column_types=dict(manifest.get("column_types", {})),
            delimiter=manifest.get("delimiter", ","),
            enclosure=manifest.get("enclosure", '"'),
            header="columns" not in manifest,
        ),
        None,
    )


def execute(
    spark: SparkSession,
    config: dict[str, Any],
    component: str,
    data_dir: str,
) -> Any:
    """Dispatch ``config['action']`` exactly like the reference's
    ``execute_action`` — ``run`` (default) or a sync action. Raises on
    error; :func:`main` maps exceptions to exit codes."""
    action = config.get("action", "run")
    params = config.get("parameters", {})
    if component == "extractor":
        cfg: Any = load_extractor_config(params)
    elif component == "writer":
        cfg = load_writer_config(
            params, data_dir if action == "run" else None
        )
    else:
        raise UserConfigError(f"unknown component type: {component!r}")

    if action == "run":
        if component == "extractor":
            out_dir = os.path.join(data_dir, "out", "tables")
            os.makedirs(out_dir, exist_ok=True)
            return run_extractor(spark, cfg, out_dir)
        return run_writer(spark, cfg)
    if action in SYNC_ACTIONS:
        src = params.get("source", {})
        dst = params.get("destination", {})
        kwargs: dict[str, Any] = {
            "namespace": src.get("namespace") or dst.get("namespace"),
            "table": src.get("table_name") or dst.get("table_name"),
        }
        if action == "list_table_columns":
            # table id comes from the config's storage input mapping
            # (reference: configuration.tables_input_mapping[0].source)
            tables = (
                config.get("storage", {}).get("input", {}).get("tables", [])
            )
            kwargs["table_id"] = tables[0]["source"] if tables else None
        return sync_action(spark, cfg, action, **kwargs)
    raise UserConfigError(f"unknown action: {action!r}")


def main(
    spark: SparkSession,
    config_path: str,
    component: str,
    data_dir: str | None = None,
) -> int:
    """Top-level entry with the reference's exit-code semantics
    (``ex-iceberg/src/component.py:168-178``): 0 success, 1 user error,
    2 system error."""
    try:
        with open(config_path) as f:
            config = json.load(f)
        execute(
            spark, config, component,
            data_dir or os.path.dirname(os.path.abspath(config_path)),
        )
        return 0
    except (UserConfigError, UserDataError) as exc:
        logging.exception(exc)
        return 1
    except Exception as exc:  # noqa: BLE001 — reference catches everything
        logging.exception(exc)
        return 2
