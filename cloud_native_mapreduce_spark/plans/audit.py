"""Physical-plan audit: machine-checkable scale discipline.

The reference has no optimizer to audit (SURVEY.md §4). On Spark the
optimizer is the platform, and what an engine owes its users is
*assurance* that the plans it produces keep the properties that matter
at 100 TB:
  * filters/column pruning reach the parquet scan (no full-table reads
    feeding a 2-column projection);
  * dimension joins broadcast instead of shuffling the fact side;
  * no accidental cartesian products;
  * top-k uses TakeOrderedAndProject, never a global sort.

These helpers parse `.explain("formatted")` output so tests (and CI)
can assert plan shape, not just result correctness — a plan regression
that silently 10×s the shuffle is caught the same way a wrong row
would be.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


@dataclass
class PlanAudit:
    """Parsed physical-plan facts."""
    text: str
    scans: list[dict] = field(default_factory=list)

    @property
    def has_broadcast_hash_join(self) -> bool:
        return "BroadcastHashJoin" in self.text

    @property
    def has_sort_merge_join(self) -> bool:
        return "SortMergeJoin" in self.text

    @property
    def has_shuffled_hash_join(self) -> bool:
        return "ShuffledHashJoin" in self.text

    @property
    def has_cartesian(self) -> bool:
        return ("CartesianProduct" in self.text
                or "BroadcastNestedLoopJoin" in self.text)

    @property
    def has_take_ordered(self) -> bool:
        return "TakeOrderedAndProject" in self.text

    @property
    def exchange_count(self) -> int:
        """Number of shuffle-exchange NODES (formatted mode prints each
        as a '(n) Exchange' detail header; broadcast exchanges print as
        '(n) BroadcastExchange' and are excluded)."""
        import re
        return len(re.findall(r"\(\d+\) Exchange\b", self.text))

    @property
    def unpartitioned_window_count(self) -> int:
        """Number of Window nodes with an EMPTY partition spec — every
        such node funnels the full input through ONE task (Spark plans
        it behind a SinglePartition exchange), the canonical 100 TB
        scale-killer. Formatted mode prints a Window's arguments as
        `[exprs], [partitionSpec], [orderSpec]` with EMPTY specs
        omitted, so 2 groups is ambiguous: partition-only (fine) or
        order-only (single partition). Order specs carry ASC/DESC
        direction tokens; partition specs never do."""
        import re
        lines = self.text.splitlines()
        n = 0
        for i, raw in enumerate(lines):
            if not re.match(r"\(\d+\) Window\b", raw.strip()):
                continue
            for j in range(i + 1, min(i + 6, len(lines))):
                ln = lines[j].strip()
                if not ln.startswith("Arguments:"):
                    continue
                depth = 0
                groups: list[str] = []
                for ch in ln:
                    if ch == "[":
                        if depth == 0:
                            groups.append("")
                        depth += 1
                    elif ch == "]":
                        depth -= 1
                    elif depth > 0:
                        groups[-1] += ch
                if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b",
                                                  groups[-1]):
                    n += 1
                break
        return n

    @property
    def global_sort_count(self) -> int:
        """Number of GLOBAL Sort nodes — each plans a full
        range-partitioning exchange of its input. Over an output that
        scales with the data this is a pure presentation cost a 100 TB
        job cannot afford (the round-10 verdict's `neighbor_agg_2hop`/
        `holt_forecast` finding); over a small aggregate it is harmless
        and allowlisted by the registry gate. Formatted mode prints a
        Sort's arguments as `[orderSpec], <global>, 0` — the boolean
        after the order-spec bracket is the global flag. TakeOrdered
        top-k plans never produce a Sort node, so they never count."""
        import re
        lines = self.text.splitlines()
        n = 0
        for i, raw in enumerate(lines):
            if not re.match(r"\(\d+\) Sort\b", raw.strip()):
                continue
            for j in range(i + 1, min(i + 6, len(lines))):
                ln = lines[j].strip()
                if not ln.startswith("Arguments:"):
                    continue
                if re.search(r"\],\s*true,\s*\d+\s*$", ln):
                    n += 1
                break
        return n

    @property
    def bucketed_scan_count(self) -> int:
        return sum(1 for ln in self.text.splitlines()
                   if ln.strip() == "Bucketed: true")

    def scans_with_pushed_filters(self) -> list[dict]:
        return [s for s in self.scans
                if s.get("PushedFilters") not in (None, "[]")]


def audit(df: DataFrame) -> PlanAudit:
    """Parse the formatted physical plan into assertable facts."""
    text = formatted_plan(df)
    scans: list[dict] = []
    cur: dict | None = None
    for raw in text.splitlines():
        ln = raw.strip()
        if ln.startswith("(") and "Scan parquet" in ln:
            cur = {"format": "parquet"}
            scans.append(cur)
        elif cur is not None and ":" in ln:
            key, _, val = ln.partition(":")
            key = key.strip()
            if key in ("PushedFilters", "ReadSchema", "Location",
                       "Output", "DataFilters"):
                cur[key] = val.strip()
            if key == "ReadSchema":
                cur = None  # ReadSchema is the last scan attribute
    return PlanAudit(text=text, scans=scans)


def assert_pruned_scan(df: DataFrame, table_hint: str,
                       max_columns: int) -> None:
    """Fail if any matching scan reads more than max_columns columns —
    the column-pruning guarantee."""
    a = audit(df)
    for s in a.scans:
        loc = s.get("Location", "")
        if table_hint in loc:
            schema = s.get("ReadSchema", "")
            n = schema.count(":")
            if n > max_columns:
                raise AssertionError(
                    f"scan of {table_hint} reads {n} columns "
                    f"(> {max_columns}): {schema}")


def assert_filter_pushed(df: DataFrame, table_hint: str) -> None:
    """Fail if the scan of `table_hint` carries no pushed filters."""
    a = audit(df)
    hits = [s for s in a.scans if table_hint in s.get("Location", "")]
    if not hits:
        raise AssertionError(f"no parquet scan of {table_hint} in plan")
    if not any(s.get("PushedFilters") not in (None, "[]") for s in hits):
        raise AssertionError(
            f"no pushed filters on {table_hint}: "
            f"{[s.get('PushedFilters') for s in hits]}")
