"""SQL front-door: the ``spark-sql -i quickstart.sql`` surface (lifecycle E1).

Parity: the reference's entire SQL DML surface (``spark/sql/quickstart.sql``,
``spark/scripts/spark_sql_testing.sh:72-108``) — CREATE TABLE (partitioned/pk-less/
cow/mor via tblproperties), INSERT VALUES/SELECT, UPDATE, DELETE, MERGE INTO,
CTAS, ``TIMESTAMP AS OF`` time travel, the ``hudi_table_changes`` TVF, and hivevar
``${var}`` templating.

Architecture: DML verbs are recognized by a small dispatcher and routed to the
table-layer API (where Catalyst plans the underlying joins/rewrites); SELECTs run on
``spark.sql`` over temp views of snapshot reads — we extend the *frontier*, not the
parser internals (the reference does the same via HoodieSparkSessionExtension,
``spark/scripts/utils.sh:4-8``).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from hudi_examples_spark.table import Table, TableConfig


class Engine:
    """Catalog of engine tables + SQL dispatcher.

    The catalog is WAREHOUSE-PERSISTENT (the hive-sync analogue of
    ``DeltaStreamerExample.scala:28-33``): every ``register`` records
    name → base path in ``{warehouse}/_catalog.json``, and a new session's
    Engine resolves those names immediately — a table registered by one job
    is queryable from the next without re-registration, which is the whole
    point of syncing a catalog. Tables instantiate lazily on first access."""

    CATALOG_FILE = "_catalog.json"

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.tables: dict[str, Table] = {}
        self._view_seq = 0
        self._locations: dict[str, str] = self._load_catalog()

    # ------------------------------------------------------------------ catalog

    def _catalog_path(self) -> str:
        return os.path.join(self.warehouse, self.CATALOG_FILE)

    def _load_catalog(self) -> dict[str, str]:
        import json

        p = self._catalog_path()
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _save_catalog(self) -> None:
        import json

        os.makedirs(self.warehouse, exist_ok=True)
        tmp = self._catalog_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._locations, f, indent=1, sort_keys=True)
        os.replace(tmp, self._catalog_path())

    def register(self, name: str, table: Table) -> None:
        self.tables[name] = table
        if self._locations.get(name) != table.base:
            self._locations[name] = table.base
            self._save_catalog()

    def unregister(self, name: str) -> None:
        self.tables.pop(name, None)
        if name in self._locations:
            del self._locations[name]
            self._save_catalog()

    def table_names(self) -> list[str]:
        return sorted(self._locations)

    def table(self, name: str) -> Table:
        if name not in self.tables:
            base = self._locations.get(name, os.path.join(self.warehouse, name))
            if Table.exists(base):
                self.tables[name] = Table(self.spark, base)
            else:
                raise KeyError(f"unknown table {name}")
        return self.tables[name]

    def _fresh_view(self, df: DataFrame, hint: str) -> str:
        self._view_seq += 1
        name = f"__engine_{hint}_{self._view_seq}"
        df.createOrReplaceTempView(name)
        return name

    def _register_snapshots(self) -> None:
        # catalog-known names resolve too: a table registered by a PREVIOUS
        # session is SELECTable here without any re-registration
        for name in sorted(set(self.tables) | set(self._locations)):
            try:
                self.table(name).read().createOrReplaceTempView(name)
            except KeyError:
                continue  # catalog entry whose files were removed externally

    # ---------------------------------------------------------------------- sql

    def sql(self, text: str, params: dict[str, str] | None = None) -> DataFrame | None:
        """Execute a script of ';'-separated statements; returns the last result DF.

        ``params`` substitutes ``${var}`` placeholders — the hivevar templating of
        ``spark_sql_testing.sh:72-75`` / ``quickstart.sql:16-20``.
        """
        for var, val in (params or {}).items():
            text = text.replace("${" + var + "}", val)
        result: DataFrame | None = None
        for stmt in self._split(text):
            result = self._execute(stmt)
        return result

    @staticmethod
    def _split(text: str) -> list[str]:
        # strip line comments, split on ';' outside quotes
        lines = [ln for ln in text.splitlines() if not ln.strip().startswith("--")]
        body = "\n".join(lines)
        stmts, cur, in_q = [], [], None
        for ch in body:
            if in_q:
                cur.append(ch)
                if ch == in_q:
                    in_q = None
            elif ch in ("'", '"'):
                in_q = ch
                cur.append(ch)
            elif ch == ";":
                s = "".join(cur).strip()
                if s:
                    stmts.append(s)
                cur = []
            else:
                cur.append(ch)
        tail = "".join(cur).strip()
        if tail:
            stmts.append(tail)
        return stmts

    def _execute(self, stmt: str) -> DataFrame | None:
        s = stmt.strip()
        head = s.split(None, 3)
        verb = head[0].upper() if head else ""
        if verb == "CREATE":
            # Hudi 1.0 index DDL: CREATE INDEX name ON t USING
            # secondary_index(col | expr(col)) — a bare in-schema identifier
            # makes a plain secondary index, anything else a functional one
            # Hudi 1.0 RLI DDL: CREATE INDEX record_index ON t (key_col) —
            # the index NAME selects the type, per the Hudi SQL surface; the
            # column list is optional and validated against the record key
            m = re.match(
                r"CREATE\s+INDEX\s+record_index\s+ON\s+(\w+)\s*(?:\((.*?)\))?\s*$",
                s,
                re.I,
            )
            if m:
                tbl = self.table(m.group(1))
                if m.group(2):
                    cols = [c.strip() for c in m.group(2).split(",")]
                    if cols != tbl.config.record_key:
                        raise ValueError(
                            f"record_index must cover the record key {tbl.config.record_key}, got {cols}"
                        )
                tbl.create_record_index()
                return None
            m = re.match(
                r"CREATE\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s+USING\s+secondary_index\s*\((.+)\)\s*$",
                s,
                re.I,
            )
            if m:
                name, tname, target = m.group(1), m.group(2), m.group(3).strip()
                # always keyed by the index NAME (so DROP INDEX name works);
                # Table.lookup(col, v) still finds a plain index by resolving
                # its defining expression
                self.table(tname).create_expression_index(name, target)
                return None
            return self._create(s)
        if verb == "INSERT":
            return self._insert(s)
        if verb == "UPDATE":
            return self._update(s)
        if verb == "DELETE":
            return self._delete(s)
        if verb == "MERGE":
            return self._merge(s)
        if verb == "ALTER":
            m = re.match(
                r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMNS?\s*\((.*)\)\s*$", s, re.I | re.S
            )
            if m:
                self.table(m.group(1)).add_columns(m.group(2))
                return None
            # Hudi delete_partition via the Spark-SQL surface:
            # ALTER TABLE t DROP PARTITION (seg='s0'[, dt='2024-01-01'])
            m = re.match(
                r"ALTER\s+TABLE\s+(\w+)\s+DROP\s+PARTITION\s*\((.+)\)\s*$", s, re.I
            )
            if m:
                # quote-aware split: partition VALUES may legally contain
                # commas/quotes (seg='a,b'); the naive split mis-parsed them
                spec = {}
                for kv in self._split_commas(m.group(2)):
                    k, eq, v = kv.partition("=")
                    if not eq:
                        raise ValueError(f"malformed partition spec entry: {kv!r}")
                    v = v.strip()
                    if len(v) >= 2 and v[0] == v[-1] and v[0] in ("'", '"'):
                        v = v[1:-1]
                    spec[k.strip()] = v
                self.table(m.group(1)).delete_partition(spec)
                return None
            m = re.match(  # parenthesized or bare column list, parens balanced
                r"ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMNS?"
                r"(?:\s*\(\s*([\w\s,]+?)\s*\)|\s+([\w\s,]+?))\s*$",
                s,
                re.I,
            )
            if m:
                cols = [c.strip() for c in (m.group(2) or m.group(3)).split(",") if c.strip()]
                self.table(m.group(1)).drop_columns(cols)
                return None
            m = re.match(
                r"ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$", s, re.I
            )
            if m:
                self.table(m.group(1)).rename_column(m.group(2), m.group(3))
                return None
            raise ValueError(
                "only ALTER TABLE t ADD COLUMNS (...) | DROP COLUMN(S) c[, ...] | "
                "DROP PARTITION (k=v[, ...]) | "
                f"RENAME COLUMN a TO b are supported: {s[:120]}"
            )
        if verb == "DROP":
            m = re.match(r"DROP\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*$", s, re.I)
            if m and m.group(1).lower() == "record_index":
                self.table(m.group(2)).drop_record_index()
                return None
            if m:
                self.table(m.group(2)).drop_secondary_index(m.group(1))
                return None
            m = re.match(r"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)", s, re.I)
            if m:
                name = m.group(1)
                try:
                    self.table(name).drop()
                except KeyError:
                    pass
                self.unregister(name)
                return None
            return None
        if verb == "SHOW" and re.match(r"SHOW\s+TABLES\s*$", s, re.I):
            return self.spark.createDataFrame(
                [(n, self._locations.get(n, "")) for n in self.table_names()],
                "tableName STRING, location STRING",
            )
        m = re.match(r"SHOW\s+INDEXES\s+(?:FROM|ON|IN)\s+(\w+)\s*$", s, re.I)
        if verb == "SHOW" and m:
            # Hudi 1.0 SHOW INDEXES: every index kind with its defining
            # expression, generation, and validity (invalid = rollback
            # invalidated it; probes fall back to scans until rebuilt)
            tbl = self.table(m.group(1))
            rows = []
            rmeta = tbl._record_index_meta()
            if rmeta is not None:
                rows.append(
                    (
                        "record_index",
                        "record_index",
                        ",".join(tbl.config.record_key),
                        int(rmeta.get("gen", 0)),
                        bool(rmeta.get("valid", True)),
                    )
                )
            for name in tbl.secondary_index_cols():
                meta = tbl._index_meta(name)
                if meta is None:
                    continue
                kind = (
                    "secondary_index"
                    if meta["expr"].strip() in tbl.schema.names
                    else "expression_index"
                )
                rows.append(
                    (
                        name,
                        kind,
                        meta["expr"],
                        int(meta.get("gen", 0)),
                        bool(meta.get("valid", True)),
                    )
                )
            return self.spark.createDataFrame(
                rows,
                "indexName STRING, indexType STRING, expr STRING, generation INT, valid BOOLEAN",
            )
        m = re.match(r"SHOW\s+PARTITIONS\s+(\w+)\s*$", s, re.I)
        if verb == "SHOW" and m:
            tbl = self.table(m.group(1))
            parts = sorted(
                {tbl._partition_of(r) for r in tbl.timeline.live_files()[0]} - {""}
            )
            return self.spark.createDataFrame(
                [(p,) for p in parts], "partition STRING"
            )
        if verb == "CALL":
            return self._call(s)
        # SELECT / SHOW / narration — rewrite engine sugar then hand to spark.sql
        return self._select(s)

    # --------------------------------------------------------------- CALL procs

    def _run_bootstrap(self, name: str, arg: str | None) -> DataFrame:
        """``CALL run_bootstrap('t', '<source_path>'[, 'record_key=a/b',
        'precombine=v', 'partition_by=p', 'table_type=cow|mor',
        'mode=metadata_only|full_record'])`` — the SQL face of Hudi's
        ``run_bootstrap`` procedure. Creates the table at
        ``{warehouse}/{name}`` from the existing parquet dataset (no rewrite
        in the default mode) and registers it in the catalog. Multi-column
        lists use ``/`` separators (commas delimit CALL arguments)."""
        toks = [t.strip().strip("'") for t in (arg or "").split(",") if t.strip()]
        if not toks:
            raise ValueError("run_bootstrap requires a source path argument")
        source, opts = toks[0], {}
        for tk in toks[1:]:
            if "=" not in tk:
                raise ValueError(f"run_bootstrap option {tk!r} must be key=value")
            k, v = tk.split("=", 1)
            opts[k.strip()] = v.strip()
        config = TableConfig(
            record_key=[c for c in opts.get("record_key", "").split("/") if c],
            precombine=opts.get("precombine") or None,
            partition_by=[c for c in opts.get("partition_by", "").split("/") if c],
            table_type=opts.get("table_type", "cow"),
        )
        tbl = Table.bootstrap(
            self.spark,
            os.path.join(self.warehouse, name),
            source,
            config,
            mode=opts.get("mode", "metadata_only"),
        )
        self.register(name, tbl)
        boot = tbl.timeline.completed_data_instants()[0]
        return self.spark.createDataFrame(
            [
                (
                    name,
                    boot.instant,
                    boot.meta.get("mode", "full_record"),
                    len(boot.files_added),
                    boot.meta.get("files_linked", 0),
                )
            ],
            "table STRING, instant STRING, mode STRING, n_files INT, n_linked INT",
        )

    def _call(self, s: str) -> DataFrame | None:
        """Hudi Spark-SQL procedures (the SQL face of the table services):
        CALL run_compaction('t'[, 'schedule'|'execute']) |
        show_compaction('t') — pending plans | run_clustering('t'[, buckets]) |
        run_clustering_sort('t'[, 'schedule'|'execute'], 'c1'[, 'c2', ...]) |
        run_clustering_zorder('t'[, 'schedule'|'execute'], 'c1', 'c2'[, ...]) |
        run_clustering_hilbert('t'[, 'schedule'|'execute'], 'c1', 'c2'[, ...]) |
        run_clustering_smallfiles('t'[, target_bytes]) — bin-pack small files |
        show_clustering('t') — pending clustering plans |
        run_log_compaction('t'[, min_logs]) — stitch small MOR logs |
        run_clean('t'[, retain]) | rebuild_index('t', 'name') |
        run_services('t') — the full policy-driven maintenance pass |
        rollback_to_instant('t'[, instant]) |
        create_savepoint('t') | restore_to_savepoint('t', instant) |
        show_commits('t') | show_savepoints('t') |
        run_archival('t'[, retain]) | split_bucket('t', lower) |
        convert_to_ranges('t', buckets) |
        run_bootstrap('t', '<src>'[, 'record_key=..', ...]) — onboard
        existing parquet without a rewrite (see ``_run_bootstrap``) |
        export_snapshot('t', '<dest>'[, 'hudi'|'parquet'][, '<as_of>']) —
        consistent snapshot copy (O(files) hardlink clone or plain parquet).
        The sort/zorder forms are
        incremental: already-in-layout partitions are skipped (see
        ``Table._cluster_rewrite``)."""
        m = re.match(r"CALL\s+(\w+)\s*\(\s*'(\w+)'\s*(?:,\s*([^)]+))?\)\s*$", s, re.I)
        if not m:
            raise ValueError(f"cannot parse CALL: {s[:120]}")
        proc, name, arg = m.group(1).lower(), m.group(2), m.group(3)
        if proc == "run_bootstrap":
            return self._run_bootstrap(name, arg)
        tbl = self.table(name)
        if proc == "run_compaction":
            # Hudi's op switch: CALL run_compaction('t'[, 'schedule'|'execute'])
            # — 'schedule' cuts a compactionplan instant for an async executor,
            # 'execute' runs the oldest pending plan; no arg = inline both.
            # optional trailing number = max_io_bytes for the schedule form
            # (the bounded-IO / LogFileSizeBased strategy budget)
            parts = [a.strip().strip("'") for a in self._split_commas(arg or "")]
            op = parts[0].lower() if parts else ""
            budget = None
            if len(parts) > 1:
                # a malformed budget must ERROR, not silently schedule an
                # unbounded compaction ('128MB' is a typo, not "no budget")
                if not parts[1].isdigit() or int(parts[1]) <= 0:
                    raise ValueError(
                        f"run_compaction budget must be a positive integer "
                        f"(bytes), got {parts[1]!r}"
                    )
                budget = int(parts[1])
            if op == "schedule":
                tbl.schedule_compaction(max_io_bytes=budget)
            elif op in ("execute", "run"):
                tbl.run_compaction()
            else:
                tbl.compact()
            return None
        if proc == "show_compaction":
            rows = [
                (i.instant, len(i.meta.get("log_rels", [])), len(i.meta.get("merge_base", [])))
                for i in tbl.pending_compactions()
            ]
            return self.spark.createDataFrame(
                rows, "plan_instant STRING, n_log_files INT, n_base_files INT"
            )
        if proc == "run_clustering":
            tbl.cluster(int(arg)) if arg else tbl.cluster(tbl.config.n_buckets or 4)
            return None
        if proc == "validate":
            # CALL validate('t') — integrity report (one row per check)
            return tbl.validate()
        if proc == "export_snapshot":
            # CALL export_snapshot('t', '<dest>'[, 'hudi'|'parquet'][, '<as_of>'])
            parts = [a.strip().strip("'") for a in self._split_commas(arg or "")]
            if not parts:
                raise ValueError("export_snapshot requires a destination path")
            dest, rest = parts[0], parts[1:]
            emode = next((a for a in rest if a in ("hudi", "parquet")), "hudi")
            as_of = next((a for a in rest if a not in ("hudi", "parquet")), None)
            tbl.export_snapshot(dest, as_of=as_of, mode=emode)
            return None
        if proc == "run_clustering_smallfiles":
            # CALL run_clustering_smallfiles('t'[, target_bytes]) — bin-pack
            # small base files into ~target-size files (Hudi's small-file
            # clustering strategy; see Table.cluster_small_files)
            tbl.cluster_small_files(int(arg.strip().strip("'"))) if arg else tbl.cluster_small_files()
            return None
        if proc in ("run_clustering_sort", "run_clustering_zorder", "run_clustering_hilbert"):
            cols = [c.strip().strip("'") for c in (arg or "").split(",") if c.strip()]
            if not cols:
                raise ValueError(f"{proc} requires a column list")
            # curve build switch (Hudi's sample build): a 'build=sample' /
            # 'build=uniform' element anywhere in the list
            build = "uniform"
            kept = []
            for c in cols:
                if c.lower().startswith("build="):
                    build = c.split("=", 1)[1].lower()
                else:
                    kept.append(c)
            cols = kept
            # async split: a leading 'schedule' cuts a clusteringplan instead
            # of rewriting inline; 'execute' runs the oldest pending plan
            if cols and cols[0].lower() == "schedule":
                tbl.schedule_clustering(
                    cols[1:],
                    zorder=proc.endswith("zorder"),
                    hilbert=proc.endswith("hilbert"),
                    build=build,
                )
            elif cols and cols[0].lower() in ("execute", "run"):
                tbl.run_clustering()
            elif proc == "run_clustering_sort":
                tbl.cluster_sort(cols)
            elif proc == "run_clustering_hilbert":
                tbl.cluster_hilbert(cols, build=build)
            else:
                tbl.cluster_zorder(cols, build=build)
            return None
        if proc == "show_clustering":
            rows = [
                (
                    i.instant,
                    i.meta.get("layout", {}).get("operation", ""),
                    len(i.meta.get("rewrite", [])),
                    len(i.meta.get("partitions", [])),
                )
                for i in tbl.pending_clusterings()
            ]
            return self.spark.createDataFrame(
                rows, "plan_instant STRING, layout STRING, n_files INT, n_partitions INT"
            )
        if proc == "run_log_compaction":
            # Hudi 1.0 log compaction: stitch small MOR logs, no base rewrite
            tbl.compact_logs(min_logs_per_partition=int(arg) if arg else 4)
            return None
        if proc == "run_clean":
            tbl.clean(retain_commits=int(arg) if arg else 10)
            return None
        if proc == "run_services":
            # the one entry point a scheduler calls per table per cadence;
            # returns the per-service report as rows so SQL callers see what ran
            rep = tbl.run_services()
            rows = [(k, json.dumps(v, default=str)) for k, v in rep.items()]
            return self.spark.createDataFrame(rows, "service STRING, result STRING")
        if proc == "run_indexing":
            # Hudi 1.0 async indexing (HoodieIndexer schedule/execute split):
            # CALL run_indexing('t', 'schedule', 'record_index') |
            # CALL run_indexing('t', 'schedule', 'secondary', '<col>') |
            # CALL run_indexing('t', 'schedule', 'expression', '<name>', '<expr>') |
            # CALL run_indexing('t'[, 'execute'])  — run the oldest pending plan
            parts = [p.strip().strip("'") for p in (arg or "").split(",") if p.strip()]
            if parts and parts[0].lower() == "schedule":
                kind = parts[1] if len(parts) > 1 else "record_index"
                tbl.schedule_indexing(
                    kind,
                    name=parts[2] if len(parts) > 2 else None,
                    expr=parts[3] if len(parts) > 3 else None,
                )
            else:
                tbl.run_indexing()
            return None
        if proc == "show_indexing":
            rows = [
                (i.instant, i.meta.get("kind", ""), i.meta.get("name", ""))
                for i in tbl.pending_indexings()
            ]
            return self.spark.createDataFrame(
                rows, "plan_instant STRING, kind STRING, name STRING"
            )
        if proc == "rebuild_index":
            if not arg:
                raise ValueError("rebuild_index requires the index name")
            iname = arg.strip().strip("'")
            if iname.lower() == "record_index":
                tbl.rebuild_record_index()
            else:
                tbl.rebuild_index(iname)
            return None
        if proc == "run_archival":
            tbl.archive_timeline(retain_instants=int(arg) if arg else 20)
            return None
        if proc == "split_bucket":
            tbl.split_bucket(int(arg))
            return None
        if proc == "convert_to_ranges":
            tbl.convert_to_ranges(int(arg))
            return None
        if proc == "rollback_to_instant":
            tbl.rollback(arg.strip().strip("'") if arg else None)
            return None
        if proc == "create_savepoint":
            tbl.savepoint(arg.strip().strip("'") if arg else None)
            return None
        if proc == "restore_to_savepoint":
            if not arg:
                raise ValueError("restore_to_savepoint requires an instant argument")
            tbl.restore_to_savepoint(arg.strip().strip("'"))
            return None
        if proc == "show_commits":
            rows = [
                (i.instant, i.action, i.meta.get("operation", ""), len(i.files_added), len(i.files_removed))
                for i in tbl.timeline.completed_data_instants()
            ]
            return self.spark.createDataFrame(
                rows, "instant STRING, action STRING, operation STRING, n_added INT, n_removed INT"
            )
        if proc == "show_savepoints":
            return self.spark.createDataFrame(
                [(sp,) for sp in tbl.savepoints()], "instant STRING"
            )
        raise ValueError(f"unknown procedure {proc}")

    # ------------------------------------------------------------------- CREATE

    _CREATE_RE = re.compile(
        r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
        r"(?:\((?P<cols>.*?)\)\s*)?"
        r"(?:USING\s+(?P<using>\w+)\s*)?"
        r"(?P<rest>.*)",
        re.I | re.S,
    )

    def _create(self, s: str) -> DataFrame | None:
        m = self._CREATE_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse CREATE: {s[:120]}")
        name = m.group("name")
        rest = m.group("rest") or ""
        props: dict[str, str] = {}
        # Hudi SQL accepts the table config through either clause
        # (quickstarts use TBLPROPERTIES; the datasource form uses OPTIONS)
        for pm in re.finditer(
            r"(?:TBLPROPERTIES|OPTIONS)\s*\((?P<body>.*?)\)", rest, re.I | re.S
        ):
            for k, v in re.findall(r"['\"]?([\w.]+)['\"]?\s*=\s*'([^']*)'", pm.group("body")):
                props[k.lower()] = v
        part = []
        pb = re.search(r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest, re.I)
        if pb:
            part = [c.strip() for c in pb.group(1).split(",") if c.strip()]
        loc = re.search(r"LOCATION\s+'([^']+)'", rest, re.I)
        base = loc.group(1) if loc else os.path.join(self.warehouse, name)
        cfg = TableConfig(
            record_key=[k.strip() for k in props.get("primarykey", "").split(",") if k.strip()],
            precombine=props.get("precombinefield") or None,
            partition_by=part,
            table_type=props.get("type", "cow"),
        )
        ctas = re.search(r"\bAS\s+(SELECT\b.*)$", rest, re.I | re.S)
        if ctas:
            df = self._select(ctas.group(1))
            tbl = Table.create_as(self.spark, base, df, cfg)
        else:
            cols = m.group("cols")
            if not cols:
                raise ValueError(f"CREATE TABLE {name} needs a column list or AS SELECT")
            tbl = Table.create(self.spark, base, cols.strip(), cfg)
        self.register(name, tbl)
        return None

    # ------------------------------------------------------------------- INSERT

    def _insert(self, s: str) -> DataFrame | None:
        m = re.match(
            r"INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<name>\w+)\s+(?P<body>.*)$",
            s,
            re.I | re.S,
        )
        if not m:
            raise ValueError(f"cannot parse INSERT: {s[:120]}")
        tbl = self.table(m.group("name"))
        body = m.group("body").strip()
        if body.upper().startswith("VALUES"):
            cols = ", ".join(tbl.data_cols)
            df = self.spark.sql(f"SELECT * FROM ({body}) AS __v({cols})")
        else:
            df = self._select(body)
            df = df.toDF(*tbl.data_cols)
        for c, f in zip(tbl.data_cols, tbl.schema.fields):
            df = df.withColumn(c, df[c].cast(f.dataType))
        if m.group("mode").upper() == "OVERWRITE":
            tbl.insert_overwrite(df)
        else:
            # SQL INSERT INTO on a keyed table upserts (Hudi spark-sql default)
            tbl.upsert(df) if tbl.config.record_key else tbl.insert(df)
        return None

    # ------------------------------------------------------------------- UPDATE

    def _update(self, s: str) -> None:
        m = re.match(
            r"UPDATE\s+(?P<name>\w+)\s+SET\s+(?P<sets>.*?)(?:\s+WHERE\s+(?P<where>.*))?$",
            s,
            re.I | re.S,
        )
        if not m:
            raise ValueError(f"cannot parse UPDATE: {s[:120]}")
        tbl = self.table(m.group("name"))
        assignments = {}
        for part in self._split_commas(m.group("sets")):
            col, expr = part.split("=", 1)
            assignments[col.strip()] = expr.strip()
        tbl.update_where(m.group("where") or "true", assignments)

    # ------------------------------------------------------------------- DELETE

    def _delete(self, s: str) -> None:
        m = re.match(
            r"DELETE\s+FROM\s+(?P<name>\w+)(?:\s+WHERE\s+(?P<where>.*))?$", s, re.I | re.S
        )
        if not m:
            raise ValueError(f"cannot parse DELETE: {s[:120]}")
        self.table(m.group("name")).delete_where(m.group("where") or "true")

    # -------------------------------------------------------------------- MERGE

    _MERGE_RE = re.compile(
        r"MERGE\s+INTO\s+(?P<target>\w+)(?:\s+AS\s+(?P<talias>\w+))?\s+"
        r"USING\s+(?P<source>\(.*?\)|\w+)(?:\s+AS\s+(?P<salias>\w+))?\s+"
        r"ON\s+(?P<on>.*?)\s+"
        r"(?P<clauses>WHEN\s+.*)$",
        re.I | re.S,
    )

    def _merge(self, s: str) -> None:
        m = self._MERGE_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse MERGE: {s[:120]}")
        tbl = self.table(m.group("target"))
        talias = m.group("talias") or m.group("target")
        salias = m.group("salias") or "source"
        src_spec = m.group("source")
        if src_spec.startswith("("):
            src_df = self._select(src_spec[1:-1])
        elif src_spec in self.tables:
            src_df = self.table(src_spec).read()
        else:
            self._register_snapshots()
            src_df = self.spark.table(src_spec)

        on: dict[str, str] = {}
        for clause in re.split(r"\bAND\b", m.group("on"), flags=re.I):
            cm = re.match(
                rf"\s*(?:{talias}|{salias})\.(\w+)\s*=\s*(?:{talias}|{salias})\.(\w+)\s*",
                clause,
                re.I,
            )
            if not cm:
                raise ValueError(f"unsupported MERGE ON clause: {clause!r}")
            a, b = cm.group(1), cm.group(2)
            tgt_col = a if re.match(rf"\s*{talias}\.", clause, re.I) else b
            src_col = b if tgt_col == a else a
            on[tgt_col] = src_col

        clauses = m.group("clauses")
        when_matched: str | dict = "update_all"
        when_not_matched: str | None = None
        wm = re.search(
            r"WHEN\s+MATCHED\s+THEN\s+(?P<act>UPDATE\s+SET\s+\*|UPDATE\s+SET\s+.*?|DELETE)"
            r"(?=\s+WHEN\s+|\s*$)",
            clauses,
            re.I | re.S,
        )
        if wm:
            act = wm.group("act").strip()
            if act.upper() == "DELETE":
                when_matched = "delete"
            elif re.match(r"UPDATE\s+SET\s+\*", act, re.I):
                when_matched = "update_all"
            else:
                sets = re.sub(r"UPDATE\s+SET\s+", "", act, flags=re.I)
                when_matched = {}
                for part in self._split_commas(sets):
                    col, expr = part.split("=", 1)
                    col = re.sub(rf"\b{talias}\.", "", col.strip(), flags=re.I)
                    when_matched[col] = self._rewrite_merge_expr(expr.strip(), talias, salias, on)
        wnm = re.search(r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*", clauses, re.I)
        if wnm:
            when_not_matched = "insert_all"
        tbl.merge(src_df, on=on, when_matched=when_matched, when_not_matched=when_not_matched)

    def _rewrite_merge_expr(self, expr: str, talias: str, salias: str, on: dict[str, str]) -> str:
        """Translate target./source. qualifiers to the merge API's namespace
        (target cols bare, non-key source cols as __src_<col>)."""
        key_srcs = set(on.values())

        def src_repl(mm):
            col = mm.group(1)
            return col if col in key_srcs else f"__src_{col}"

        expr = re.sub(rf"\b{salias}\.(\w+)", src_repl, expr, flags=re.I)
        expr = re.sub(rf"\b{talias}\.(\w+)", r"\1", expr, flags=re.I)
        return expr

    @staticmethod
    def _split_commas(s: str) -> list[str]:
        """Split on commas not inside parens/quotes."""
        out, cur, depth, in_q = [], [], 0, None
        for ch in s:
            if in_q:
                cur.append(ch)
                if ch == in_q:
                    in_q = None
            elif ch in ("'", '"'):
                in_q = ch
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                cur.append(ch)
            elif ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur).strip())
        return [p for p in out if p]

    # ------------------------------------------------------------------- SELECT

    def _select(self, s: str) -> DataFrame:
        # M10: FROM tbl TIMESTAMP AS OF '...'
        def tt_repl(mm):
            view = self._fresh_view(self.table(mm.group(1)).read(as_of=mm.group(2)), "asof")
            return f"FROM {view}"

        s = re.sub(r"FROM\s+(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", tt_repl, s, flags=re.I)

        # M11: hudi_table_changes('tbl', 'latest_state', 'begin'[, 'end'])
        def tvf_repl(mm):
            name, start, end = mm.group(1), mm.group(2), mm.group(3)
            df = self.table(name).table_changes(start=start, end=end)
            return self._fresh_view(df, "changes")

        s = re.sub(
            r"hudi_table_changes\(\s*'(\w+)'\s*,\s*'latest_state'\s*,\s*'([^']+)'"
            r"(?:\s*,\s*'([^']+)')?\s*\)",
            tvf_repl,
            s,
            flags=re.I,
        )

        # Hudi 1.0 completion-time incremental form:
        # hudi_table_changes('tbl', 'latest_state_completion', '<start_ct>'[, '<end_ct>'])
        # — bounds by publish stamps, closing the NBCC begin-cursor hole
        def ct_repl(mm):
            name, start_ct, end_ct = mm.group(1), mm.group(2), mm.group(3)
            df = self.table(name).table_changes_by_completion(
                float(start_ct), float(end_ct) if end_ct else None
            )
            return self._fresh_view(df, "changes_ct")

        s = re.sub(
            r"hudi_table_changes\(\s*'(\w+)'\s*,\s*'latest_state_completion'\s*,"
            r"\s*'([^']+)'(?:\s*,\s*'([^']+)')?\s*\)",
            ct_repl,
            s,
            flags=re.I,
        )

        # M11/M13 CDC form: hudi_table_changes('tbl', 'cdc', 'begin'[, 'end'])
        # — change type + before/after images (Hudi hoodie.table.cdc semantics)
        def cdc_repl(mm):
            name, start, end = mm.group(1), mm.group(2), mm.group(3)
            df = self.table(name).table_changes_cdc(start=start, end=end)
            return self._fresh_view(df, "cdc")

        s = re.sub(
            r"hudi_table_changes\(\s*'(\w+)'\s*,\s*'cdc'\s*,\s*'([^']+)'"
            r"(?:\s*,\s*'([^']+)')?\s*\)",
            cdc_repl,
            s,
            flags=re.I,
        )

        # Hudi 1.0 metadata-table TVF: hudi_metadata('tbl', 'files' |
        # 'partitions' | 'column_stats' | 'bloom_filters' | 'record_index')
        def meta_repl(mm):
            df = self.table(mm.group(1)).metadata(mm.group(2))
            return self._fresh_view(df, "metadata")

        s = re.sub(
            r"hudi_metadata\(\s*'(\w+)'\s*,\s*'(\w+)'\s*\)",
            meta_repl,
            s,
            flags=re.I,
        )
        self._register_snapshots()
        return self.spark.sql(s)
