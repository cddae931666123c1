"""Stateful streaming operators (SURVEY §2.3 W3, §7.2 step 6).

W3 latest-value enrich: merge a slowly-changing config stream with a
work stream; each work item is processed under the most recent config
(config updates win races — the ``select!`` bias in
examples/orchestrator/src/lib.rs:244-287, state apply :81-94).

Streaming rendering: union the two streams tagged by side, group by the
enrichment key, and keep {latest config} in
``applyInPandasWithState`` state. Within a micro-batch rows are applied
in timestamp order with config-before-work at equal timestamps, which
matches the batch as-of-join oracle (SURVEY §7.4.6).

Scale note: state is O(#keys x config width) — the config side is tiny
by construction (slowly-changing); the work stream never accumulates in
state. Shuffle is one hash partitioning on the key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tag_union(work: DataFrame, config: DataFrame, ts: str, key_cols: list[str]) -> DataFrame:
    """Union work+config into one keyed stream with a side tag.

    Columns of the other side are null-padded (same shape as the batch
    as-of join's union stage in relational.asof_join).
    """
    wcols = set(work.columns)
    ccols = set(config.columns)
    w = work.withColumn("_side", F.lit("work"))
    c = config.withColumn("_side", F.lit("config"))
    for col, dtype in config.dtypes:
        if col not in wcols:
            w = w.withColumn(col, F.lit(None).cast(dtype))
    for col, dtype in work.dtypes:
        if col not in ccols:
            c = c.withColumn(col, F.lit(None).cast(dtype))
    return w.unionByName(c.select(*w.columns))


def latest_enrich_stream(
    tagged: DataFrame,
    key_cols: list[str],
    ts: str,
    config_cols: list[str],
    work_cols: list[str],
    output_schema: str,
) -> DataFrame:
    """Streaming W3: apply latest-seen config to each work row.

    ``tagged`` is the output of :func:`tag_union`. Output rows are work
    rows with ``<config_col>_asof`` columns attached (null until the
    first config arrives — same as the as-of join oracle).

    Config values travel as a string envelope (cast JVM-side, so ints
    stay '100' not '100.0') — the generic analogue of selium's byte
    frames; callers re-type downstream. Work columns keep their
    declared types: the union's null-padding makes pandas widen them to
    float64, so they are coerced back to the output schema before the
    Arrow hand-off.
    """
    from pyspark.sql import types as T

    for c in config_cols:
        tagged = tagged.withColumn(c, F.col(c).cast("string"))

    out_struct = T._parse_datatype_string(output_schema)
    assert isinstance(out_struct, T.StructType)
    int_cols = [
        f.name
        for f in out_struct.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))
    ]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            current = dict(zip(config_cols, state.get))
        else:
            current = {c: None for c in config_cols}
        out = []
        for pdf in pdfs:
            # config rows sort before work rows at equal ts -> latest-wins
            pdf = pdf.sort_values([ts, "_side"]).reset_index(drop=True)
            for _, row in pdf.iterrows():
                if row["_side"] == "config":
                    current = {c: (None if pd.isna(row[c]) else row[c]) for c in config_cols}
                else:
                    rec = {c: row[c] for c in work_cols}
                    for c in config_cols:
                        rec[f"{c}_asof"] = current[c]
                    out.append(rec)
        state.update(tuple(current[c] for c in config_cols))
        if out:
            out_df = pd.DataFrame(out)
            for c in int_cols:
                if c in out_df.columns:
                    out_df[c] = out_df[c].astype("Int64")
            yield out_df

    return tagged.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=", ".join(f"{c} string" for c in config_cols),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_lsh_pairs(
    banded: DataFrame,
    id_col: str = "doc_id",
    band_key: str = "band_key",
    max_state_ids: int = 10_000,
) -> DataFrame:
    """Incremental near-dup detection on a document stream: candidate
    pairs are emitted the moment a document lands in a band bucket that
    already holds other documents.

    ``banded`` is a stream of (id, band_id, band_key) rows (the
    JVM-side output of dedup.lsh_candidate_pairs' banding stage);
    state per band bucket = the id set seen so far (capped —
    overflowing buckets are near-identical swarms where more pairs add
    no information). Emission: each arriving id pairs with every
    already-seen id in its bucket, so over a full replay the emitted
    set equals the batch LSH candidate pairs.

    Scale: state is keyed by uniform md5 band keys (no skew); per-key
    state is a short id list. This is the streaming twin of the batch
    band self-join.
    """

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for doc in sorted(pdf[id_col].tolist()):
                doc = int(doc)
                if doc in seen:
                    continue
                for other in seen:
                    lo, hi = (other, doc) if other < doc else (doc, other)
                    out_a.append(lo)
                    out_b.append(hi)
                if len(seen) < max_state_ids:
                    seen.append(doc)
        state.update(([int(x) for x in seen],))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return banded.groupBy(band_key).applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long",
        stateStructType="ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(df: DataFrame, keys: list[str], ts: str, watermark: str) -> DataFrame:
    """Streaming exact dedup with bounded state
    (``dropDuplicatesWithinWatermark``) — state is pruned past the
    watermark, so memory is O(keys within the watermark horizon), not
    O(all history). The scale-safe streaming twin of batch dedup."""
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_funnel(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Incremental ordered-funnel state per user (the streaming twin of
    windows.funnel): state = (step_reached, last_step_ts); each
    micro-batch folds its events in event-time order and emits the
    user's updated snapshot. Greedy first-touch advancement is
    identical to the batch fold when events arrive in event-time order
    (the replay harness's file order); late data cannot retract a
    committed step — the standard streaming-funnel caveat.

    State is two scalars per user — bounded, applyInPandasWithState
    update mode, the reference's per-key stateful-guest shape
    (SURVEY §2.6).
    """

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            step, t_prev_us = state.get
        else:
            step, t_prev_us = 0, None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col).reset_index(drop=True)
            for _, row in pdf.iterrows():
                if step >= len(steps):
                    break
                ts_us = int(row[ts_col].value // 1000)  # pandas ns -> us
                if row[type_col] == steps[step] and (
                    step == 0 or (t_prev_us is not None and ts_us > t_prev_us)
                ):
                    step += 1
                    t_prev_us = ts_us
        state.update((step, t_prev_us))
        yield pd.DataFrame({"user": [key[0]], "step_reached": [step]})

    return events.select(
        F.col(user_col).alias("user"), F.col(type_col), F.col(ts_col)
    ).groupBy("user").applyInPandasWithState(
        fn,
        outputStructType="user long, step_reached int",
        stateStructType="step int, t_prev_us long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_scd2(
    events: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Streaming twin of :func:`relational.scd2_history`: fold a keyed
    change stream into SCD type-2 intervals incrementally — the CDC
    shape of the reference's config-version state machine
    (examples/orchestrator/src/lib.rs:81-94,244-287), evolved one step
    from "latest value per key" to "every historical interval".

    State per key is TWO scalars — the open run's (state, valid_from) —
    so state size is O(#keys), never O(#events). Each micro-batch folds
    its rows in (ts, tiebreak) order: a state change CLOSES the open
    interval (emitted once, with its valid_to) and opens a new one; the
    batch ends by re-emitting the key's current OPEN interval (null
    valid_to). The memory-sink snapshot therefore carries every closed
    interval exactly once plus possibly-stale open-interval emissions;
    readers collapse them with
    ``groupBy(key, state, valid_from).agg(min(coalesce(valid_to,
    sentinel)))`` — a closed emission (real valid_to < sentinel)
    supersedes the stale open one. Equal to the batch fold when batches
    arrive in event-time order (the replay harness's file order) —
    the same caveat as :func:`streaming_funnel`.
    """

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_state, cur_from_us = state.get
        else:
            cur_state, cur_from_us = None, None
        parts = [p for p in pdfs if len(p)]
        if not parts:
            state.update((cur_state, cur_from_us))
            yield pd.DataFrame(
                {
                    "key": pd.Series([], dtype="int64"),
                    "state": pd.Series([], dtype="object"),
                    "valid_from": pd.to_datetime([], unit="us"),
                    "valid_to": pd.to_datetime([], unit="us"),
                }
            )
            return
        # Vectorized edge detection: a micro-batch carries thousands of
        # rows per key group, so the fold must not drop to per-row
        # Python. Sort once, shift to compare each row's state with its
        # predecessor (the stored open run stands in for row -1), and
        # only the few EDGE rows reach Python lists.
        pdf = pd.concat(parts).sort_values([ts_col, tiebreak_col])
        sts = pdf[state_col].reset_index(drop=True)
        ts_us = (pdf[ts_col].astype("int64") // 1000).reset_index(drop=True)
        prev = sts.shift()
        mask = sts.ne(prev)
        mask.iloc[0] = cur_state is None or sts.iloc[0] != cur_state
        e_states = sts[mask].tolist()
        e_from = ts_us[mask].tolist()
        run_states = ([cur_state] if cur_state is not None else []) + e_states
        run_froms = ([cur_from_us] if cur_state is not None else []) + e_from
        # run i closes where run i+1 opens; the last run stays open
        out_state = run_states[:-1] + [run_states[-1]]
        out_from = run_froms[:-1] + [run_froms[-1]]
        out_to: list = run_froms[1:] + [None]
        cur_state, cur_from_us = run_states[-1], int(run_froms[-1])
        state.update((cur_state, cur_from_us))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_state),
                "state": out_state,
                "valid_from": pd.to_datetime(out_from, unit="us"),
                "valid_to": pd.to_datetime(
                    [pd.NaT if t is None else t for t in out_to], unit="us"
                ),
            }
        )

    return events.select(
        F.col(key_col).alias("key"),
        F.col(state_col),
        F.col(ts_col),
        F.col(tiebreak_col),
    ).groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=(
            "key long, state string, valid_from timestamp, valid_to timestamp"
        ),
        stateStructType="cur_state string, cur_from_us long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_gapfill_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    grain: str = "day",
) -> DataFrame:
    """Streaming twin of :func:`windows.gapfill_locf`: emit the dense
    per-key period grid incrementally as observations arrive, holes
    filled by last-observation-carried-forward.

    State per key is FOUR scalars — the current period ordinal, the
    winning observation's (ts, tiebreak) within it, and its value — so
    state is O(#keys) regardless of series length. Each micro-batch
    folds its rows in (ts, tiebreak) order: an observation in a LATER
    period first emits one filled row per skipped period (carrying the
    previous value), then opens the new period; an observation in the
    CURRENT period re-emits it when (ts, tiebreak) beats the stored
    winner (the per-period "last obs wins" pick). Rows carry the
    winning (src_ts_us, src_tb) so readers collapse re-emissions with
    ``max_by((value, is_filled), (src_ts_us, src_tb))`` per
    (key, period). Equal to the batch fold when batches arrive in
    event-time order (the replay harness's file order) — periods never
    reopen, the same caveat as :func:`streaming_funnel` /
    :func:`streaming_scd2`.
    """
    if grain not in ("day", "hour"):
        raise ValueError(f"streaming_gapfill_locf grain must be 'day' or 'hour', got {grain!r}")
    period_us = 86_400_000_000 if grain == "day" else 3_600_000_000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_p, cur_ts_us, cur_tb, cur_val = state.get
        else:
            cur_p, cur_ts_us, cur_tb, cur_val = None, None, None, None
        out: list[tuple] = []  # (period_ord, value, is_filled, src_ts, src_tb)
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tiebreak_col]).reset_index(drop=True)
            for _, row in pdf.iterrows():
                ts_us = int(row[ts_col].value // 1000)
                tb = int(row[tiebreak_col])
                val = float(row[value_col])
                p = ts_us // period_us
                if cur_p is None:
                    cur_p, cur_ts_us, cur_tb, cur_val = p, ts_us, tb, val
                    out.append((p, val, False, ts_us, tb))
                elif p > cur_p:
                    for hole in range(cur_p + 1, p):
                        # filled rows inherit the carried obs's ordering
                        out.append((hole, cur_val, True, cur_ts_us, cur_tb))
                    cur_p, cur_ts_us, cur_tb, cur_val = p, ts_us, tb, val
                    out.append((p, val, False, ts_us, tb))
                elif p == cur_p and (ts_us, tb) > (cur_ts_us, cur_tb):
                    cur_ts_us, cur_tb, cur_val = ts_us, tb, val
                    out.append((p, val, False, ts_us, tb))
                # p < cur_p (late data) is dropped: periods never reopen
        state.update((cur_p, cur_ts_us, cur_tb, cur_val))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out),
                "period": pd.to_datetime([o[0] * period_us for o in out], unit="us"),
                "value": [o[1] for o in out],
                "is_filled": [o[2] for o in out],
                "src_ts_us": [o[3] for o in out],
                "src_tb": [o[4] for o in out],
            }
        )

    return events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col),
        F.col(value_col),
        F.col(tiebreak_col),
    ).groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=(
            "key long, period timestamp, value double, is_filled boolean, "
            "src_ts_us long, src_tb long"
        ),
        stateStructType=(
            "cur_p long, cur_ts_us long, cur_tb long, cur_val double"
        ),
        outputMode="update",
        timeoutConf="NoTimeout",
    )
