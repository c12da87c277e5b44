"""Declarative configuration surface — parity with the reference's pydantic
models (the component "API").

Mirrors, field for field:

- Extractor: ``Source{namespace, table_name, snapshot_id}``,
  ``DataSelection{mode, columns}``, ``Destination{parquet_output, file_name,
  table_name, load_type, primary_key, preserve_insertion_order}``
  (reference: ``components/ex-iceberg/src/configuration.py:18-56``).
- Writer: ``Destination{namespace, table_name, mode, primary_key,
  partition_by, preserve_insertion_order, all_varchar}``
  (reference: ``components/wr-iceberg/src/configuration.py:18-31``).
- Shared catalog block (``components/common/configuration.py:4-14``) —
  here the warehouse is either a SnapCatalog path or an Iceberg REST
  catalog (io.iceberg.iceberg_conf).

Plain dataclasses (stdlib) instead of pydantic: validation is explicit in
``validate()`` and failures raise :class:`UserConfigError`, matching the
reference's user-error exit path (``ex-iceberg/src/component.py:173-178``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class UserConfigError(ValueError):
    """Invalid user configuration (reference exit code 1 semantics)."""


SELECT_ALL = "all_data"
SELECT_COLUMNS = "selected_columns"

LOAD_FULL = "full_load"
LOAD_INCREMENTAL = "incremental_load"

WRITE_REPLACE = "replace"
WRITE_APPEND = "append"
WRITE_UPSERT = "upsert"


@dataclass
class CatalogConfig:
    """Catalog connection (SnapCatalog warehouse dir, or REST for the
    Iceberg connector path)."""

    name: str = "local"
    warehouse: str = ""
    uri: str | None = None  # set → REST catalog via io.iceberg
    token: str | None = None


@dataclass
class Source:
    namespace: str
    table_name: str
    snapshot_id: int | None = None


@dataclass
class DataSelection:
    mode: str = SELECT_ALL
    columns: list[str] = field(default_factory=list)

    def validate(self) -> None:
        if self.mode not in (SELECT_ALL, SELECT_COLUMNS):
            raise UserConfigError(f"invalid selection mode: {self.mode!r}")
        if self.mode == SELECT_COLUMNS and not self.columns:
            raise UserConfigError("selected_columns mode requires columns")


@dataclass
class ExtractorDestination:
    parquet_output: bool = False
    file_name: str = "output"
    table_name: str = "output"
    load_type: str = LOAD_FULL
    primary_key: list[str] = field(default_factory=list)
    preserve_insertion_order: bool = True

    @property
    def incremental(self) -> bool:
        # parity: ``incremental`` computed from load_type
        # (ex-iceberg/src/configuration.py:44-50)
        return self.load_type == LOAD_INCREMENTAL

    def validate(self) -> None:
        if self.load_type not in (LOAD_FULL, LOAD_INCREMENTAL):
            raise UserConfigError(f"invalid load_type: {self.load_type!r}")


@dataclass
class ExtractorConfig:
    catalog: CatalogConfig
    source: Source
    data_selection: DataSelection = field(default_factory=DataSelection)
    destination: ExtractorDestination = field(default_factory=ExtractorDestination)
    limit: int = 100_000  # the reference's hard scan cap
    custom_query: str | None = None  # declared-but-unimplemented in ref → real here

    def validate(self) -> None:
        self.data_selection.validate()
        self.destination.validate()
        if self.custom_query and self.data_selection.mode == SELECT_COLUMNS:
            raise UserConfigError("custom_query and selected_columns are exclusive")


@dataclass
class WriterDestination:
    namespace: str
    table_name: str
    mode: str = WRITE_REPLACE
    primary_key: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)
    preserve_insertion_order: bool = False
    all_varchar: bool = False

    def validate(self) -> None:
        if self.mode not in (WRITE_REPLACE, WRITE_APPEND, WRITE_UPSERT):
            raise UserConfigError(f"invalid write mode: {self.mode!r}")
        if self.mode == WRITE_UPSERT and not self.primary_key:
            raise UserConfigError("upsert mode requires a primary_key")


@dataclass
class CsvInput:
    """Manifest-declared CSV shape (reference:
    ``wr-iceberg/src/component.py:66-77`` + the .manifest contract)."""

    path: str
    columns: list[str]
    column_types: dict[str, str] = field(default_factory=dict)  # spark DDL types
    delimiter: str = ","
    enclosure: str = '"'
    header: bool = True


@dataclass
class WriterConfig:
    catalog: CatalogConfig
    destination: WriterDestination
    input_csv: CsvInput | None = None
    input_parquet: str | None = None  # the reference's TODO, real here

    def validate(self) -> None:
        self.destination.validate()
        if (self.input_csv is None) == (self.input_parquet is None):
            raise UserConfigError("exactly one input (csv or parquet) required")
