"""Agent-transcript analytics: tool-call retry statistics and shared-prefix
conversation dedup.

The input hint's transcript table carries (conv_id, turn_idx, role, tool, ts)
— an ordered per-conversation ACTION STREAM. Two curation questions every
agent-transcript corpus owner asks:

- **Tool retry behavior** (`tool_retry_stats`): how often is the same action
  re-issued immediately (a retry), and how often does an action follow an
  error (a recovery)? Retry-heavy tools are flaky; transcripts dominated by
  retry loops are low-value training data.
- **Shared-prefix dedup** (`prefix_dedup`): agent frameworks re-run a
  conversation from the top after a failure, so a corpus accumulates many
  transcripts sharing a long common prefix of actions. Per conversation:
  the deepest action prefix shared with at least one other conversation,
  and how many share it — the signal a prefix-aware dedup/weighting stage
  keys on (cf. the same prefix-hash idea used by trie dedup in session-log
  mining).

Both operators are schema-generic over any (key, order..., type) action
stream: the registered queries bind to the driver ``events`` table
(user_id / ts,event_id / event_type), and ``events_from_transcripts``
adapts the BASELINE.json transcript shape (conv_id / turn_idx /
coalesce(tool, role)) to the same contract — pinned by
tests/test_agent_ops.py on the synthetic transcript corpus.

Scale shape: tool_retry_stats is one per-key lag window + one hash
aggregate over a tiny type domain (the sessionize layout — unbounded
parallel key, map-side combine). prefix_dedup bounds its explode at
MAX_PREFIX_DEPTH rows per conversation, groups on fixed-width md5 prefix
digests (map-side combine), and the join back is equi-keyed on (depth,
digest); per-conversation state is one ≤MAX_PREFIX_DEPTH-element array —
nothing quadratic, no skew-prone collect.

All arithmetic is integer (counts, permille via div) — exact across
engines per the repo float rules.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .windows import _events, _user_order

# A repeat of the same action within this many seconds of its predecessor
# counts as a retry; an action this soon after an error counts as the
# recovery step.
RETRY_WINDOW_SECONDS = 300

# Prefix depth cap: bounds the per-conversation explode and the deepest
# shared prefix reported. Retried-run prefixes are overwhelmingly short;
# depth beyond ~12 adds rows linearly for near-zero extra dedup signal.
MAX_PREFIX_DEPTH = 12


def events_from_transcripts(
    transcripts: DataFrame, keep_text: bool = False
) -> DataFrame:
    """Adapt the BASELINE.json transcript shape (conv_id, turn_idx, role,
    tool, ts) to the action-stream contract the agent operators consume:
    the conversation is the key, turn order is the complete ordering key,
    and the action type is the tool name when present else the role. Pure
    column projection — no shuffle. ``keep_text`` carries the turn text
    as ``content`` for the content-keyed operators
    (adjacent_dup_collapse).

    Two review-hardened choices: the key is xxhash64 (the manifest.py
    convention — a 32-bit hash would collide and silently interleave two
    conversations at ~100k-conv scale), and ``ep`` derives from the REAL
    turn timestamp so retry windows and latency quantiles measure wall
    time, not turn counts; turn_idx stays the within-timestamp
    tiebreaker. The ep idiom branches on the stored type: an instant
    (TIMESTAMP_LTZ, the transcripts_df shape) converts via unix_micros —
    tz-independent and monotonic across DST, where an LTZ→NTZ cast
    renders in session-local wall time and goes backwards over a
    fall-back transition; a naive TIMESTAMP_NTZ (the driver-parquet
    shape) uses the windows._events timestampdiff idiom, which never
    consults the session zone."""
    ts_type = transcripts.schema["ts"].dataType.typeName()
    if ts_type == "timestamp_ntz":
        ep = F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:
        ep = F.unix_micros(F.col("ts").cast("timestamp"))
    cols = [
        F.xxhash64("conv_id").alias("user_id"),
        F.col("turn_idx").cast("bigint").alias("event_id"),
        ep.alias("ep"),
        F.coalesce("tool", "role").alias("event_type"),
    ]
    if keep_text:
        cols.append(F.col("text").alias("content"))
    return transcripts.select(*cols)


def tool_retry_stats(ev: DataFrame) -> DataFrame:
    """Per action type: calls, immediate same-type retries, post-error
    recoveries, and the integer-permille retry rate. ``ev`` needs columns
    (user_id, event_id, ep, event_type) with (ep, event_id) a complete
    per-user ordering key."""
    w = _user_order()
    prev_type = F.lag("event_type").over(w)
    gap = F.col("ep") - F.lag("ep").over(w)
    within = gap <= RETRY_WINDOW_SECONDS * 1_000_000
    flagged = ev.select(
        "event_type",
        (
            prev_type.isNotNull()
            & (prev_type == F.col("event_type"))
            & within
        ).cast("long").alias("is_retry"),
        (
            prev_type.isNotNull()
            & (prev_type == F.lit("error"))
            & (F.col("event_type") != F.lit("error"))
            & within
        ).cast("long").alias("is_recovery"),
    )
    return (
        flagged.groupBy(F.col("event_type").alias("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("is_retry").alias("n_retries"),
            F.sum("is_recovery").alias("n_recoveries"),
        )
        .withColumn(
            "retry_permille", F.expr("div(n_retries * 1000, n_calls)")
        )
    )


def q_tool_retry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form over the driver events table (event_type plays the
    tool name)."""
    return tool_retry_stats(_events(spark, sf_dir))


def _prefix_frame(ev: DataFrame) -> DataFrame:
    """(user_id, d, h): one md5 prefix digest per key per depth 1..
    min(len, MAX_PREFIX_DEPTH) — the shared trie substrate of
    prefix_dedup and the trie profile."""
    seqs = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ep", "event_id", "event_type"))
            ).alias("seq")
        )
        .select(
            "user_id",
            F.expr(
                f"slice(transform(seq, x -> x.event_type), 1, {MAX_PREFIX_DEPTH})"
            ).alias("types"),
        )
    )
    # length-prefixed elements before joining: a bare '|' join is ambiguous
    # when an action type itself contains '|' (namespaced tool names) —
    # ["a|b","c"] and ["a","b|c"] must NOT share a digest
    return seqs.select(
        "user_id",
        F.explode(F.expr("sequence(1, size(types))")).alias("d"),
        "types",
    ).select(
        "user_id",
        F.col("d").cast("long").alias("d"),
        F.md5(
            F.expr(
                "concat_ws('|', transform(slice(types, 1, d),"
                " x -> concat(cast(length(x) as string), ':', x)))"
            )
        ).alias("h"),
    )


def prefix_dedup(ev: DataFrame) -> DataFrame:
    """Per key: the deepest shared action prefix (capped at
    MAX_PREFIX_DEPTH) and the number of keys sharing it.

    Construction: per key the ordered type array (stable sort via
    sort_array over (ep, event_id, type) structs — the repo's W5 idiom),
    one row per prefix depth (bounded explode), md5 prefix digests,
    a (depth, digest) count, and an equi-join back. Keys sharing no
    prefix report depth 0.

    The prefix frame is localCheckpointed once (the dedup.py signature
    idiom): the count, the join-back probe side, and the user universe
    all read it — without the checkpoint the groupBy+collect_list subtree
    would run three times (the CLAUDE.md self-join rule). The count
    output is one ROW per (depth, digest) joined back equi-keyed — a
    universally shared depth-1 prefix ships a count, never a collected
    id list, so no skew bomb."""
    pref = _prefix_frame(ev).localCheckpoint(eager=True)
    shared = (
        pref.groupBy("d", "h")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .where(F.col("n_users") >= 2)
    )
    # One prefix per (user, depth) -> max(struct) is (deepest shared depth,
    # its sharer count), mirrored by max(d)/arg_max(n_users, d) in the oracle.
    best = (
        pref.join(shared, ["d", "h"])
        .groupBy("user_id")
        .agg(F.max(F.struct("d", "n_users")).alias("m"))
    )
    # every key has a depth-1 row -> the user universe reads the checkpoint
    users = pref.where(F.col("d") == 1).select("user_id")
    return users.join(best, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("m.d"), F.lit(0)).cast("long").alias(
            "max_shared_depth"
        ),
        F.coalesce(F.col("m.n_users"), F.lit(0)).cast("long").alias(
            "n_sharers"
        ),
    )


def q_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form over the driver events table (per-user event-type
    sequences play the conversation action streams)."""
    return prefix_dedup(_events(spark, sf_dir))


_RETRY_US = RETRY_WINDOW_SECONDS * 1_000_000

ORACLES = {
    "tool_retry_stats": f"""
        WITH seq AS (
            SELECT event_type,
                   lag(event_type) OVER w AS prev_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), f AS (
            SELECT event_type,
                   CASE WHEN prev_type IS NOT NULL
                             AND prev_type = event_type
                             AND gap <= {_RETRY_US}
                        THEN 1 ELSE 0 END AS is_retry,
                   CASE WHEN prev_type IS NOT NULL
                             AND prev_type = 'error'
                             AND event_type <> 'error'
                             AND gap <= {_RETRY_US}
                        THEN 1 ELSE 0 END AS is_recovery
            FROM seq
        )
        SELECT event_type AS tool,
               count(*) AS n_calls,
               sum(is_retry)::BIGINT AS n_retries,
               sum(is_recovery)::BIGINT AS n_recoveries,
               (sum(is_retry)::BIGINT * 1000) // count(*) AS retry_permille
        FROM f GROUP BY 1
    """,
    "prefix_dedup": f"""
        WITH arr AS (
            SELECT user_id,
                   (list(event_type ORDER BY ts, event_id))[1:{MAX_PREFIX_DEPTH}]
                       AS types
            FROM events GROUP BY user_id
        ), pref AS (
            SELECT user_id, dd.d AS d,
                   md5(array_to_string(list_transform(types[1:dd.d],
                   x -> length(x)::VARCHAR || ':' || x), '|')) AS h
            FROM arr,
                 LATERAL (SELECT unnest(range(1, len(types) + 1)) AS d) dd
        ), shared AS (
            SELECT d, h, count(*) AS n_users
            FROM pref GROUP BY 1, 2 HAVING count(*) >= 2
        ), best AS (
            SELECT p.user_id,
                   max(p.d) AS max_shared_depth,
                   arg_max(s.n_users, p.d) AS n_sharers
            FROM pref p JOIN shared s USING (d, h)
            GROUP BY 1
        )
        SELECT u.user_id,
               coalesce(b.max_shared_depth, 0)::BIGINT AS max_shared_depth,
               coalesce(b.n_sharers, 0)::BIGINT AS n_sharers
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN best b USING (user_id)
    """,
}

QUERIES = {
    "tool_retry_stats": q_tool_retry_stats,
    "prefix_dedup": q_prefix_dedup,
}


def action_trie_profile(ev: DataFrame) -> DataFrame:
    """The trie fan-out curve of the action streams: at each prefix depth
    d (1..MAX_PREFIX_DEPTH), how many conversations are still active
    (have >= d actions), how many DISTINCT action prefixes they spread
    over, and the integer-permille diversity ratio. Low diversity at
    depth d means conversations are near-clones up to d actions — the
    corpus-level statistic behind prefix-aware dedup/weighting decisions
    (prefix_dedup answers the same question per conversation; this is the
    dataset-card view).

    Scale shape: one bounded explode (<= MAX_PREFIX_DEPTH rows per key)
    + one depth-keyed hash aggregate with map-side combine over md5
    digests; output is <= MAX_PREFIX_DEPTH rows."""
    pref = _prefix_frame(ev)
    return (
        pref.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.countDistinct("h").alias("n_prefixes"),
        )
        .withColumn(
            "diversity_permille",
            F.expr("div(n_prefixes * 1000, n_active)"),
        )
    )


def q_action_trie_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form over the driver events table."""
    return action_trie_profile(_events(spark, sf_dir))


ORACLES["action_trie_profile"] = f"""
    WITH arr AS (
        SELECT user_id,
               (list(event_type ORDER BY ts, event_id))[1:{MAX_PREFIX_DEPTH}]
                   AS types
        FROM events GROUP BY user_id
    ), pref AS (
        SELECT user_id, dd.d AS d,
               md5(array_to_string(list_transform(types[1:dd.d],
                   x -> length(x)::VARCHAR || ':' || x), '|')) AS h
        FROM arr,
             LATERAL (SELECT unnest(range(1, len(types) + 1)) AS d) dd
    )
    SELECT d, count(*) AS n_active,
           count(DISTINCT h)::BIGINT AS n_prefixes,
           (count(DISTINCT h) * 1000) // count(*) AS diversity_permille
    FROM pref GROUP BY d
"""

QUERIES["action_trie_profile"] = q_action_trie_profile


_LAT_QUANTILES = (50, 90, 99)


def tool_latency_quantiles(ev: DataFrame) -> DataFrame:
    """Per-tool inter-action latency distribution: for every action, its
    latency is the microsecond gap since the key's previous action; per
    action type, exact nearest-rank p50/p90/p99 of those gaps (type-1,
    rank ceil(q*n/100) — the length_quantiles idiom, all-integer so both
    engines agree). The per-tool latency/SLO panel of the retry stats.

    Scale shape: one per-key lag window (unbounded parallel key), then
    one window shuffle keyed on the tiny tool domain for the rank — the
    exact-replay form; at 100 TB the twin is approx_percentile (t-digest,
    partial-mergeable), as documented for length_quantiles."""
    w = _user_order()
    gaps = ev.select(
        "event_type",
        "event_id",
        (F.col("ep") - F.lag("ep").over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("event_type")
    d = gaps.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(wn)
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {q} + 99) div 100"),
                F.col("gap_us"),
            )
        ).alias(f"p{q}_us")
        for q in _LAT_QUANTILES
    ]
    return d.groupBy(F.col("event_type").alias("tool")).agg(
        F.max("n").alias("n_gaps"), *aggs
    )


def q_tool_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form over the driver events table."""
    return tool_latency_quantiles(_events(spark, sf_dir))


ORACLES["tool_latency_quantiles"] = f"""
    WITH gaps AS (
        SELECT event_type, event_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), d AS (
        SELECT event_type, gap_us,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY gap_us, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT event_type AS tool, max(n) AS n_gaps,
           {", ".join(
               f"max(CASE WHEN rn = (n * {q} + 99) // 100 "
               f"THEN gap_us END) AS p{q}_us"
               for q in _LAT_QUANTILES
           )}
    FROM d GROUP BY event_type
"""

QUERIES["tool_latency_quantiles"] = q_tool_latency_quantiles


def adjacent_dup_collapse(ev: DataFrame, content_col: str = "content") -> DataFrame:
    """Adjacent duplicate-content collapse — the chat-log cleaner: an agent
    stuck in a loop (or a client retrying a send) emits consecutive turns
    with IDENTICAL content; training corpora collapse those runs to one
    turn. Per key: events seen, events collapsed (same content digest as
    the immediate predecessor within RETRY_WINDOW), events kept. Content
    compares by md5 digest so the lag window carries fixed-width keys,
    never the payload text.

    Distinct from tool_retry_stats (same TYPE re-issued — a behavioral
    signal) and dedup_exact (corpus-global content identity): this is
    positional, within-stream, window-bounded."""
    w = _user_order()
    d = F.md5(F.coalesce(F.col(content_col), F.lit("")))
    gap = F.col("ep") - F.lag("ep").over(w)
    # when/otherwise, not cast: the first event of a key has NULL lag, and
    # NULL.cast(long) stays NULL — a single-event key would then sum to
    # NULL n_collapsed where the oracle's CASE..ELSE 0 yields 0.
    dup = F.when(
        (d == F.lag(d).over(w))
        & (gap <= RETRY_WINDOW_SECONDS * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = ev.select("user_id", dup.alias("is_dup"))
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_dup").alias("n_collapsed"),
        )
        .withColumn("n_kept", F.col("n_events") - F.col("n_collapsed"))
    )


def q_adjacent_dup_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form over the driver events table (``props`` plays the
    turn content)."""
    return adjacent_dup_collapse(_events(spark, sf_dir), content_col="props")


ORACLES["adjacent_dup_collapse"] = f"""
    WITH seq AS (
        SELECT user_id,
               CASE WHEN md5(coalesce(props, ''))
                         = lag(md5(coalesce(props, ''))) OVER w
                     AND epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         <= {RETRY_WINDOW_SECONDS * 1_000_000}
                    THEN 1 ELSE 0 END AS is_dup
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*) AS n_events,
           sum(is_dup)::BIGINT AS n_collapsed,
           (count(*) - sum(is_dup))::BIGINT AS n_kept
    FROM seq GROUP BY user_id
"""

QUERIES["adjacent_dup_collapse"] = q_adjacent_dup_collapse


# --- Sequence grammar audit ----------------------------------------------------
def sequence_grammar_audit(ev: DataFrame) -> DataFrame:
    """Sequence-grammar validation — the transcript schema-validation
    stage in action-stream form: every per-key event sequence is checked
    against a literal transition grammar and each key gets a verdict row
    (violation count, first offending position and kind, valid flag).
    For the driver events table the grammar is the funnel contract; bound
    through ``events_from_transcripts`` the same checks read as role
    alternation (a conversation must open with a user turn, a tool result
    must follow a tool call, two consecutive errors are a storm).

    Rules, in precedence order (first match names the violation):
      bad_start       first event of a key is neither signup nor view
      dup_signup      signup appears mid-stream
      blind_purchase  purchase whose predecessor is not view/click/purchase
      error_storm     two consecutive errors

    Scale shape: one keyed lag/row_number window (the sessionize shuffle)
    and one map-side-combined groupBy back to one row per key; the first
    offender is min/min_by with a FILTER clause — no sort of the full
    sequence, no collect_list state."""
    w = _user_order()
    prev = F.lag("event_type").over(w)
    cur = F.col("event_type")
    kind = (
        F.when(
            prev.isNull() & ~cur.isin("signup", "view"), F.lit("bad_start")
        )
        .when(prev.isNotNull() & (cur == "signup"), F.lit("dup_signup"))
        .when(
            prev.isNotNull()
            & (cur == "purchase")
            & ~prev.isin("view", "click", "purchase"),
            F.lit("blind_purchase"),
        )
        .when((cur == "error") & (prev == "error"), F.lit("error_storm"))
    )
    d = ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("pos"),
        kind.alias("kind"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("kind").alias("n_violations"),
        F.expr("min(pos) FILTER (WHERE kind IS NOT NULL)").alias(
            "first_bad_pos"
        ),
        F.expr("min_by(kind, pos) FILTER (WHERE kind IS NOT NULL)").alias(
            "first_bad_kind"
        ),
        F.expr("cast(count(kind) = 0 as bigint)").alias("is_valid"),
    )


def q_sequence_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form over the driver events table (event_type plays the
    action/role name)."""
    return sequence_grammar_audit(_events(spark, sf_dir))


ORACLES["sequence_grammar"] = """
    WITH s AS (
        SELECT user_id,
               row_number() OVER w AS pos,
               event_type,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), k AS (
        SELECT user_id, pos,
               CASE
                   WHEN prev IS NULL
                        AND event_type NOT IN ('signup', 'view')
                       THEN 'bad_start'
                   WHEN prev IS NOT NULL AND event_type = 'signup'
                       THEN 'dup_signup'
                   WHEN prev IS NOT NULL AND event_type = 'purchase'
                        AND prev NOT IN ('view', 'click', 'purchase')
                       THEN 'blind_purchase'
                   WHEN event_type = 'error' AND prev = 'error'
                       THEN 'error_storm'
               END AS kind
        FROM s
    )
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           count(kind)::BIGINT AS n_violations,
           (min(pos) FILTER (WHERE kind IS NOT NULL))::BIGINT
               AS first_bad_pos,
           arg_min(kind, pos) FILTER (WHERE kind IS NOT NULL)
               AS first_bad_kind,
           (count(kind) = 0)::BIGINT AS is_valid
    FROM k GROUP BY user_id
"""

QUERIES["sequence_grammar"] = q_sequence_grammar
