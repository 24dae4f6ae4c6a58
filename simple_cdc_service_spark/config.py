"""Table configuration.

The reference hard-codes its table name (`main.py:29`), value-column list
(`["order_id", "invoice_number"]`, main.py:52) and primary-key column
(`ch_primary_key_column = "order_id"`, main.py:57). Here those become
configuration, so the same CDC operators work for any keyed table.

Spark has no enforced primary keys; ``key_columns`` is the *merge-key
convention* the changelog-collapse and upsert operators honor
(SURVEY.md §1.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ChangeTableConfig:
    """Describes one replicated keyed table.

    Attributes:
        name: logical table name (reference: ``dev.invoice``).
        key_columns: merge-key columns (reference PK ``order_id``).
        value_columns: non-key payload columns (reference
            ``invoice_number``).
        order_columns: columns that totally order the changelog. The
            reference relies on implicit single-partition Kafka order; we
            require it explicitly — Kafka ``(partition, offset)`` or the
            Debezium binlog coordinates ``(source.file, source.pos,
            source.row)`` (example/insert.json:186-190).
    """

    name: str
    key_columns: tuple[str, ...]
    value_columns: tuple[str, ...]
    order_columns: tuple[str, ...] = ("offset",)
    op_column: str = "op"

    @property
    def all_columns(self) -> tuple[str, ...]:
        return self.key_columns + self.value_columns


# The reference's one table, as configuration (mysql/init-script/script.sql:3-7).
INVOICE = ChangeTableConfig(
    name="invoice",
    key_columns=("order_id",),
    value_columns=("invoice_number",),
)

# The driver-data-derived CDC table used by the oracle-checked queries:
# a changelog over `events` keyed by user_id (sources/changelog.py).
USER_VALUE = ChangeTableConfig(
    name="user_value",
    key_columns=("user_id",),
    value_columns=("last_value",),
    # "offset" is a DuckDB reserved word; the derived changelog names its
    # order column ev_offset so the oracle SQL can reference it unquoted.
    order_columns=("ev_offset",),
)
