package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.DistWindow
import QueryDef.{table, BoundedSort}
import JoinQueries.events

/** Event-behavior analytics (beyond the reference): the product-side
  * measurement layer over the events stream — cohort retention, Markov
  * transition structure, RFM value segmentation, robust (median/MAD)
  * anomaly gating — plus a cross-document repeated-span screen on the
  * corpus side (the exact-substring complement of the q70 winnowing
  * family). House rules as everywhere: rank and threshold on exact
  * integers (basis points via integer division, micros/cents for
  * money), keep every corpus-sized aggregation map-side combinable,
  * never hang an unpartitioned window on a data-sized relation.
  */
object BehaviorQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---- weekly cohort retention matrix --------------------------------
    // Cohort = a user's first active epoch-week; cell (cohort, offset) =
    // distinct users of that cohort active offset weeks later;
    // retention in basis points against the cohort's own week-0 size.
    // ONE user-keyed exchange carries everything: min(week) and the
    // distinct active-week set are partial-aggregated map-side, and the
    // per-user state is bounded by the CALENDAR (#weeks in the corpus
    // window), not by the user's event count — a 10M-event user costs
    // the same handful of week longs as a 10-event one. The
    // retention-vs-week-0 window runs on the aggregated cohort×offset
    // table (calendar² rows).
    QueryDef(
      "q136_retention_cohorts",
      (s, dir) => {
        graft.ops.Behavior
          .retentionCohorts(events(s, dir), "user_id",
            unix_timestamp(col("ts")))
          .sortBounded("cohort_week", "week_offset")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk
          FROM events),
        c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY user_id),
        cell AS (SELECT cohort_week, wk - cohort_week AS week_offset,
            COUNT(*) AS n_users
          FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
        SELECT cohort_week, week_offset, n_users,
          CAST(n_users * 10000 // (MAX(CASE WHEN week_offset = 0
            THEN n_users END) OVER (PARTITION BY cohort_week)) AS BIGINT)
            AS retention_bp
        FROM cell ORDER BY cohort_week, week_offset""")),

    // ---- event-type Markov transition matrix ---------------------------
    // Next-event structure: P(to | from) over consecutive events per
    // user, in basis points. The lead() window partitions by user_id
    // (high cardinality — the q19 sessionize precedent); the transition
    // counts are map-side combinable and the row-total normalization
    // runs on the |types|² aggregate only.
    QueryDef(
      "q137_markov_transitions",
      (s, dir) => {
        graft.ops.Behavior
          .markovTransitions(events(s, dir), "user_id", "event_type",
            Seq(col("ts"), col("event_id")))
          .sortBounded("from_type", "to_type")
      },
      Some("""WITH t AS (SELECT event_type,
            LEAD(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS to_type
          FROM events),
        c AS (SELECT event_type AS from_type, to_type, COUNT(*) AS n
          FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          CAST(n * 10000 // (SUM(n) OVER (PARTITION BY from_type))
            AS BIGINT) AS p_bp
        FROM c ORDER BY from_type, to_type""")),

    // ---- RFM value segmentation ----------------------------------------
    // Classic recency/frequency/monetary quartile grid over purchasers.
    // The corpus collapses to one row per purchasing user with ONE
    // combinable aggregation; the three quartile ranks then run on that
    // users-sized table via DistWindow.withGlobalRank (two-phase bucket
    // rank — no task ever serializes the whole user population), with
    // quartile cuts as exact integer rank inequalities so both engines
    // place boundary users identically. Quartile 1 = most recent /
    // least frequent / smallest spend; code RFM = r*100 + f*10 + m.
    QueryDef(
      "q138_rfm_segments",
      (s, dir) => {
        import s.implicits._
        val e = events(s, dir)
        val p = e.filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(max(unix_timestamp($"ts")).as("last_s"),
            count(lit(1)).as("freq"),
            sum(round($"value" * 100).cast("long")).as("mon_c"))
        val anchor = e.agg(max(unix_timestamp($"ts")).as("anchor_s"))
        val r0 = p.crossJoin(broadcast(anchor))
          .withColumn("rec_d", expr("(anchor_s - last_s) DIV 86400"))
        // melt to 3 rows per user (tag 1=R, 2=F, 3=M), each carrying its
        // measure's sort value and monotone bucket: ONE grouped-rank
        // machinery (one exchange + one tiny count/offset broadcast)
        // replaces three independent global-rank machineries, the
        // separate user-count aggregate, the checkpoint barrier and two
        // of the three user-keyed assembly joins; nu rides the same
        // count table as the rank offsets (groupTotalCol). Bucket
        // contract per tag matches the old branches: rec_d / freq /
        // mon_c DIV 10000, each a monotone coarsening of its order.
        // Scale note: a static bucket cannot subdivide a heavy TIE
        // block (freq=1 may hold a large user fraction, and its window
        // task sorts that block by user_id alone). At extreme skew the
        // production shape is quantile CUTS — per-measure histogram
        // (value, count) → the 3 cut values, then resolve the cut
        // block's user_id boundary by distributed selection — because
        // only users AT a cut value need the tiebreak; every other
        // quartile is decided by the combinable histogram. Kept as the
        // exact-rank form here: the oracle pins per-user (v, user_id)
        // rank semantics, and the tie-block bound at this corpus's
        // freq/rec_d domains stays far under one task's memory.
        val melted = r0.select($"user_id", $"mon_c",
          explode(array(
            struct(lit(1).as("tag"), $"rec_d".as("v"), $"rec_d".as("bkt")),
            struct(lit(2).as("tag"), $"freq".as("v"), $"freq".as("bkt")),
            struct(lit(3).as("tag"), $"mon_c".as("v"),
              floor($"mon_c" / 10000.0).cast("long").as("bkt")))).as("m"))
          .select($"user_id", $"mon_c", $"m.tag", $"m.v", $"m.bkt")
        DistWindow.withGroupedRank(melted, col("tag"), col("bkt"),
            Seq(col("v"), col("user_id")), "rk",
            groupTotalCol = Some("nu"))
          .groupBy($"user_id")
          .agg(max($"mon_c").as("mon_c"),
            max(when($"tag" === 1, expr("(rk-1)*4 DIV nu + 1"))).as("rq"),
            max(when($"tag" === 2, expr("(rk-1)*4 DIV nu + 1"))).as("fq"),
            max(when($"tag" === 3, expr("(rk-1)*4 DIV nu + 1"))).as("mq"))
          .select(expr("rq*100 + fq*10 + mq").as("rfm_code"), $"mon_c")
          .groupBy("rfm_code")
          .agg(count(lit(1)).as("n_users"),
            sum($"mon_c").as("total_monetary_cents"))
          // rfm_code domain is ≤64 rows at ANY scale — the bounded-sort
          // contract (one helper, documented on QueryDef.sortBounded)
          .sortBounded($"rfm_code")
      },
      Some("""WITH p AS (SELECT user_id,
            MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS last_s,
            COUNT(*) AS freq,
            CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS mon_c
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        a AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
            AS anchor_s FROM events),
        n AS (SELECT COUNT(*) AS nu FROM p),
        r AS (SELECT user_id, freq, mon_c,
            (anchor_s - last_s) // 86400 AS rec_d FROM p CROSS JOIN a),
        rk AS (SELECT user_id, freq, mon_c, rec_d,
            ROW_NUMBER() OVER (ORDER BY rec_d, user_id) AS rr,
            ROW_NUMBER() OVER (ORDER BY freq, user_id) AS fr,
            ROW_NUMBER() OVER (ORDER BY mon_c, user_id) AS mr
          FROM r),
        qs AS (SELECT mon_c,
            ((rr-1)*4)//nu + 1 AS rq, ((fr-1)*4)//nu + 1 AS fq,
            ((mr-1)*4)//nu + 1 AS mq
          FROM rk CROSS JOIN n)
        SELECT CAST(rq*100 + fq*10 + mq AS BIGINT) AS rfm_code,
          COUNT(*) AS n_users,
          CAST(SUM(mon_c) AS BIGINT) AS total_monetary_cents
        FROM qs GROUP BY 1 ORDER BY rfm_code""")),

    // ---- robust (median/MAD) anomaly gate ------------------------------
    // Per event type: exact lower median and MAD of the value stream in
    // micros, and the count of events beyond 3×MAD — the outlier gate a
    // telemetry pipeline runs where mean/stddev would let one spike
    // poison its own threshold. Both medians come from
    // DistWindow.withGroupedRank ((type, value-bucket) windows +
    // broadcast offsets — no task serializes an event type) with the
    // element picked by the exact rank inequality rn = (n+1) DIV 2; the
    // per-type medians/MADs are broadcast back (|types| rows by
    // semantics — an enum, not an id space).
    QueryDef(
      "q139_anomaly_robust",
      (s, dir) => {
        graft.ops.Behavior
          .robustAnomalyReport(events(s, dir), "event_type", "event_id",
            "value")
          .sortBounded("event_type")
      },
      Some("""WITH e AS (SELECT event_id, event_type,
            CAST(ROUND(value * 1000000) AS BIGINT) AS v FROM events),
        r1 AS (SELECT event_type, event_id, v,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY v, event_id) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        med AS (SELECT event_type, v AS med_mi, n FROM r1
          WHERE rn = (n + 1) // 2),
        d AS (SELECT e.event_type, e.event_id,
            ABS(e.v - m.med_mi) AS dev, m.med_mi, m.n
          FROM e JOIN med m USING (event_type)),
        r2 AS (SELECT event_type, dev, n,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY dev, event_id) AS rn FROM d),
        mad AS (SELECT event_type, dev AS mad_mi FROM r2
          WHERE rn = (n + 1) // 2),
        f AS (SELECT d.event_type, d.med_mi, d.n, m2.mad_mi,
            CASE WHEN d.dev > 3 * m2.mad_mi THEN 1 ELSE 0 END AS an
          FROM d JOIN mad m2 USING (event_type))
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
          CAST(MAX(med_mi) AS BIGINT) AS median_micro,
          CAST(MAX(mad_mi) AS BIGINT) AS mad_micro,
          CAST(SUM(an) AS BIGINT) AS n_anomalies,
          CAST(SUM(an) * 10000 // MAX(n) AS BIGINT) AS anomaly_bp
        FROM f GROUP BY event_type ORDER BY event_type""")),

    // ---- cross-document repeated spans (exact-substring screen) --------
    // The exact complement of q70's sampled winnowing: maximal runs of
    // ≥ 12 consecutive shared tokens between document pairs, found by
    // matching positional 8-token gram hashes and chaining consecutive
    // matches along each alignment diagonal (ia − ib) with the
    // rank-islands trick. Grams cross the wire as positional 60-bit
    // md5 slices from ONE codegen kernel pass (gram_hash_seq); the
    // document-frequency cap (2..16 docs) bounds the equi-join fanout —
    // hotter grams are boilerplate, which q87 strips by design — and
    // every window partitions by (pair, diagonal), whose group size is
    // bounded by a document's token count, never by corpus size.
    QueryDef(
      "q140_repeated_spans",
      (s, dir) => {
        graft.ops.Spans
          .repeatedSpans(table(s, dir, "documents"), "text", "doc_id",
            k = 8, minSpan = 12, dfCap = 16)
          .orderBy("doc_a", "doc_b")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        gl AS (SELECT doc_id, list_transform(range(len(toks) - 7),
            i -> CAST(('0x' || substr(md5(array_to_string(
              list_slice(toks, i + 1, i + 8), ' ')), 1, 15)) AS BIGINT))
            AS gs
          FROM t WHERE len(toks) >= 8),
        gpos AS (SELECT doc_id, unnest(list_transform(range(len(gs)),
            i -> {'pos': i, 'g': gs[i + 1]}), recursive := true)
          FROM gl),
        dfc AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd
            FROM gpos GROUP BY g) WHERE nd BETWEEN 2 AND 16),
        m AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.pos - b.pos AS diag, a.pos AS ia
          FROM gpos a JOIN gpos b USING (g) JOIN dfc USING (g)
          WHERE a.doc_id < b.doc_id),
        runs AS (SELECT doc_a, doc_b, diag, ia,
            ia - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
              ORDER BY ia) AS grp
          FROM m),
        r2 AS (SELECT doc_a, doc_b, diag, grp, COUNT(*) AS run,
            MIN(ia) AS start_a
          FROM runs GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, CAST(MAX(run + 7) AS BIGINT) AS max_span_tokens,
          COUNT(*) AS n_spans, CAST(MIN(start_a) AS BIGINT) AS first_pos_a
        FROM r2 WHERE run >= 5 GROUP BY doc_a, doc_b
        ORDER BY doc_a, doc_b""")),

    // ---- user lifecycle (growth accounting) ----------------------------
    // Per epoch-week: users who are new (first active week), retained
    // (also active the week before), resurrected (active earlier but
    // not last week), and churned (active week w−1 but not w, counted
    // at w). The per-user week set rides the SAME one user-keyed
    // exchange as q136 (calendar-bounded array), and the prev/next-week
    // classification happens in array-land — no per-user window pass.
    // The churn horizon is the corpus max week (1-row broadcast), so no
    // user "churns" past the end of observed data.
    QueryDef(
      "q141_user_lifecycle",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val wk = floor(unix_timestamp($"ts") / 604800.0).cast("long")
        val per = ev.select($"user_id", wk.as("wk"))
          .groupBy($"user_id")
          .agg(sort_array(collect_set($"wk")).as("wks"))
        val mx = ev.agg(max(wk).as("maxwk"))
        val st = per.crossJoin(broadcast(mx))
          .select(explode(expr(
            """transform(sequence(0, size(wks) - 1), i -> named_struct(
                 'wk', wks[i],
                 'pwk', CASE WHEN i = 0 THEN CAST(NULL AS BIGINT)
                   ELSE wks[i - 1] END,
                 'nwk', CASE WHEN i = size(wks) - 1 THEN CAST(NULL AS BIGINT)
                   ELSE wks[i + 1] END))""")).as("s"), $"maxwk")
          .select($"s.wk".as("wk"), $"s.pwk".as("pwk"),
            $"s.nwk".as("nwk"), $"maxwk")
        val active = st.select($"wk".as("week"),
          when($"pwk".isNull, "new")
            .when($"wk" - $"pwk" === 1, "retained")
            .otherwise("resurrected").as("state"))
        val churned = st
          .filter(($"nwk".isNull || $"nwk" > $"wk" + 1) &&
            $"wk" + 1 <= $"maxwk")
          .select(($"wk" + 1).as("week"), lit("churned").as("state"))
        active.unionByName(churned)
          .groupBy("week")
          .agg(sum(when($"state" === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when($"state" === "retained", 1L).otherwise(0L))
              .as("n_retained"),
            sum(when($"state" === "resurrected", 1L).otherwise(0L))
              .as("n_resurrected"),
            sum(when($"state" === "churned", 1L).otherwise(0L))
              .as("n_churned"))
          .sortBounded("week")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk
          FROM events),
        mx AS (SELECT MAX(wk) AS maxwk FROM uw),
        st AS (SELECT user_id, wk,
            LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS pwk,
            LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nwk
          FROM uw),
        ev AS (
          SELECT wk AS week,
            CASE WHEN pwk IS NULL THEN 'new'
              WHEN wk - pwk = 1 THEN 'retained'
              ELSE 'resurrected' END AS state
          FROM st
          UNION ALL
          SELECT wk + 1 AS week, 'churned' AS state
          FROM st CROSS JOIN mx
          WHERE (nwk IS NULL OR nwk > wk + 1) AND wk + 1 <= maxwk)
        SELECT week,
          CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
          CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_retained,
          CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_resurrected,
          CAST(SUM(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_churned
        FROM ev GROUP BY week ORDER BY week""")),

    // ---- top session paths (sequence mining lite) ----------------------
    // The 20 most common session-opening paths: first ≤5 event types of
    // each q19 session, joined with '>'. Everything derives from the
    // SAME user-partitioned window exchange q19 uses — session id is
    // the running new-session sum, and the within-session index is
    // rn − session_start_rn (the start rn propagated by last(...,
    // ignoreNulls) over the same frame) — so no second (user, session)
    // shuffle and the collect_list per session is capped at 5 structs
    // BEFORE aggregation, never a whole session's events.
    QueryDef(
      "q144_session_paths",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, 0)
        val marked = graft.ops.Behavior.withSessionIds(events(s, dir))
          .withColumn("rn", row_number().over(w))
          .withColumn("start_rn",
            last(when($"new_session" === 1L, $"rn"), ignoreNulls = true)
              .over(run))
          .withColumn("idx", $"rn" - $"start_rn" + 1)
          .filter($"idx" <= 5)
        marked
          .groupBy($"user_id", $"session_id")
          .agg(sort_array(collect_list(struct($"idx", $"event_type")))
            .as("evs"))
          .select(concat_ws(">",
            expr("transform(evs, e -> e.event_type)")).as("path"))
          .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
          .orderBy($"n_sessions".desc, $"path")
          .limit(20)
      },
      Some("""WITH m AS (SELECT user_id, event_id, ts, event_type,
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_ts,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS rn
          FROM events),
        mk AS (SELECT *, CASE WHEN prev_ts IS NULL
              OR (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
               - (epoch_us(CAST(prev_ts AS TIMESTAMP)) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_session
          FROM m),
        sess AS (SELECT user_id, event_id, event_type, rn,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY rn
              ROWS UNBOUNDED PRECEDING) AS session_id,
            MAX(CASE WHEN new_session = 1 THEN rn END)
              OVER (PARTITION BY user_id ORDER BY rn
                ROWS UNBOUNDED PRECEDING) AS start_rn
          FROM mk),
        capped AS (SELECT user_id, session_id, event_type,
            rn - start_rn + 1 AS idx
          FROM sess WHERE rn - start_rn + 1 <= 5),
        paths AS (SELECT array_to_string(
            list(event_type ORDER BY idx), '>') AS path
          FROM capped GROUP BY user_id, session_id)
        SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20""")),

    // ---- A/B arm comparison (two-proportion conversion lift) -----------
    // Deterministic arm assignment by md5 parity of the user id (the
    // hash-split q40 discipline — both engines derive identical arms),
    // conversion = the user's total purchase value exceeds $600 in
    // exact cents (every user has SOME purchase in this corpus, so a
    // has-purchased flag would be degenerate p=1 and the z undefined).
    // ONE user-keyed combinable aggregation collapses the corpus; rates
    // and lift are exact basis points off the 2-row arm table; the z
    // statistic is the one double formula computed from exact integers
    // and rounded once (micro units).
    QueryDef(
      "q145_ab_lift",
      (s, dir) => {
        import s.implicits._
        val per = events(s, dir)
          .select($"user_id", $"event_type", $"value")
          .groupBy($"user_id")
          .agg(when(sum(when($"event_type" === "purchase",
              round($"value" * 100).cast("long")).otherwise(0L)) > 60000L,
            1L).otherwise(0L).as("conv"))
          .withColumn("arm",
            conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
              .cast("long") % 2)
        per.groupBy()
          .agg(
            sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when($"arm" === 0, $"conv").otherwise(0L)).as("conv_a"),
            sum(when($"arm" === 1, $"conv").otherwise(0L)).as("conv_b"))
          // empty-arm guard (the q164/q121 convention): an all-one-arm
          // slice must yield NULL rates, not an engine-asymmetric
          // division error (DuckDB raises on x // 0, Spark DIV nulls)
          .withColumn("cvr_a_bp",
            expr("CASE WHEN n_a > 0 THEN conv_a * 10000 DIV n_a END"))
          .withColumn("cvr_b_bp",
            expr("CASE WHEN n_b > 0 THEN conv_b * 10000 DIV n_b END"))
          .withColumn("diff_bp", $"cvr_b_bp" - $"cvr_a_bp")
          .withColumn("z_micro", expr("""CASE WHEN n_a > 0 AND n_b > 0
            THEN CAST(ROUND(
            (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a) /
            SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 / n_a + 1.0 / n_b)) * 1000000) AS BIGINT) END"""))
      },
      Some("""WITH per AS (SELECT user_id,
            CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) > 60000
              THEN 1 ELSE 0 END AS conv,
            CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS arm
          FROM events GROUP BY user_id),
        s AS (SELECT
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
              AS conv_a,
            CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
              AS conv_b
          FROM per)
        SELECT n_a, n_b, conv_a, conv_b,
          CAST(CASE WHEN n_a > 0 THEN conv_a * 10000 // n_a END
            AS BIGINT) AS cvr_a_bp,
          CAST(CASE WHEN n_b > 0 THEN conv_b * 10000 // n_b END
            AS BIGINT) AS cvr_b_bp,
          CAST(CASE WHEN n_a > 0 AND n_b > 0
            THEN conv_b * 10000 // n_b - conv_a * 10000 // n_a END
            AS BIGINT) AS diff_bp,
          CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(ROUND(
            (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a) /
            SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 / n_a + 1.0 / n_b)) * 1000000) AS BIGINT) END AS z_micro
        FROM s""")),

    // ---- Pareto concentration (power-user share) -----------------------
    // What fraction of all events do the top 1% / 10% most active users
    // generate? The corpus collapses to one row per user (combinable),
    // the activity rank is a two-phase global rank (bucket = −count, so
    // no task serializes the user table), the cuts are exact integer
    // head sizes (GREATEST(1, n DIV k)), and the shares are one
    // conditional aggregation over the ranked table.
    QueryDef(
      "q146_pareto_events",
      (s, dir) => {
        import s.implicits._
        val per = events(s, dir).groupBy($"user_id")
          .agg(count(lit(1)).as("cnt"))
        val ranked = DistWindow.withGlobalRank(per, -col("cnt"),
          Seq(-col("cnt"), col("user_id")), "rk")
        val tot = per.agg(count(lit(1)).as("n_users"),
          sum($"cnt").as("total_events"))
        ranked.crossJoin(broadcast(tot))
          .groupBy($"n_users", $"total_events")
          .agg(
            sum(when($"rk" <= greatest(lit(1L),
              expr("n_users DIV 100")), $"cnt")).as("top1_events"),
            sum(when($"rk" <= greatest(lit(1L),
              expr("n_users DIV 10")), $"cnt")).as("top10_events"))
          .select($"n_users", $"total_events",
            greatest(lit(1L), expr("n_users DIV 100")).as("top1_users"),
            expr("top1_events * 10000 DIV total_events").as("top1_share_bp"),
            greatest(lit(1L), expr("n_users DIV 10")).as("top10_users"),
            expr("top10_events * 10000 DIV total_events")
              .as("top10_share_bp"))
      },
      Some("""WITH per AS (SELECT user_id, COUNT(*) AS cnt FROM events
          GROUP BY user_id),
        rk AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id)
            AS rk FROM per),
        tot AS (SELECT COUNT(*) AS n_users, CAST(SUM(cnt) AS BIGINT)
            AS total_events FROM per)
        SELECT n_users, total_events,
          GREATEST(1, n_users // 100) AS top1_users,
          CAST(CAST(SUM(CASE WHEN rk <= GREATEST(1, n_users // 100)
            THEN cnt ELSE 0 END) AS BIGINT) * 10000 // total_events
            AS BIGINT) AS top1_share_bp,
          GREATEST(1, n_users // 10) AS top10_users,
          CAST(CAST(SUM(CASE WHEN rk <= GREATEST(1, n_users // 10)
            THEN cnt ELSE 0 END) AS BIGINT) * 10000 // total_events
            AS BIGINT) AS top10_share_bp
        FROM rk CROSS JOIN tot
        GROUP BY n_users, total_events""")),

    // ---- cohort LTV curve (cumulative revenue per cohort-week) ---------
    // q136's revenue face: per (cohort_week, week_offset), the number
    // of active cohort users and the CUMULATIVE purchase revenue per
    // original cohort member in exact cents. One (user, week) pre-agg
    // (combinable) feeds one user-keyed collect of calendar-bounded
    // (week, cents) entries — cohort, cells and cohort size all derive
    // from that single path (the offset-0 cell IS the cohort size, so
    // no second pass and no fork); the cumulative window runs on the
    // cohort×offset aggregate only.
    QueryDef(
      "q148_cohort_ltv",
      (s, dir) => {
        import s.implicits._
        val wk = floor(unix_timestamp($"ts") / 604800.0).cast("long")
        val uw = events(s, dir)
          .select($"user_id", wk.as("wk"),
            when($"event_type" === "purchase",
              round($"value" * 100).cast("long")).otherwise(0L).as("cents"))
          .groupBy($"user_id", $"wk").agg(sum($"cents").as("cents"))
        val per = uw.groupBy($"user_id")
          .agg(min($"wk").as("cohort_week"),
            collect_list(struct($"wk", $"cents")).as("entries"))
        val cells = per
          .select($"cohort_week", explode($"entries").as("e"))
          .select($"cohort_week",
            ($"e.wk" - $"cohort_week").as("week_offset"), $"e.cents")
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"), sum($"cents").as("rev_cents"))
        val wC = Window.partitionBy($"cohort_week").orderBy($"week_offset")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wC0 = Window.partitionBy($"cohort_week")
        cells
          .withColumn("cum_rev_cents", sum($"rev_cents").over(wC))
          .withColumn("n0",
            max(when($"week_offset" === 0, $"n_users")).over(wC0))
          .withColumn("ltv_cents", expr("cum_rev_cents DIV n0"))
          .drop("rev_cents", "n0")
          .sortBounded("cohort_week", "week_offset")
      },
      Some("""WITH uw AS (SELECT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk,
            CAST(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS cents
          FROM events GROUP BY user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800),
        c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw
          GROUP BY user_id),
        cell AS (SELECT cohort_week, wk - cohort_week AS week_offset,
            COUNT(*) AS n_users, CAST(SUM(cents) AS BIGINT) AS rev_cents
          FROM uw JOIN c USING (user_id) GROUP BY 1, 2),
        cum AS (SELECT cohort_week, week_offset, n_users,
            CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week
              ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS cum_rev_cents,
            MAX(CASE WHEN week_offset = 0 THEN n_users END)
              OVER (PARTITION BY cohort_week) AS n0
          FROM cell)
        SELECT cohort_week, week_offset, n_users, cum_rev_cents,
          CAST(cum_rev_cents // n0 AS BIGINT) AS ltv_cents
        FROM cum ORDER BY cohort_week, week_offset""")),

    // ---- inter-event gap percentiles (latency/SLO telemetry) -----------
    // Per event type: exact p50/p90/p99 of the gap (in seconds) between
    // an event and the SAME user's previous event of any type — the
    // arrival-cadence report an SLO dashboard reads. Gaps come from the
    // q137 per-user lead window; the gaps then collapse to a (type,
    // gap_s) COUNT HISTOGRAM (one combinable aggregation — gap values
    // are whole seconds bounded by the time horizon, so the histogram
    // is domain-bounded) and DistWindow.histCeilRanks picks all three
    // percentiles from one per-type window over it, with the same
    // ceil-rank position ceil(n·p/100) the oracle's
    // r·100 ≥ n·p > (r−1)·100 inequality selects — an id tie-break
    // never changes which VALUE sits at a position.
    QueryDef(
      "q149_gap_percentiles",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val gaps = events(s, dir)
          .withColumn("prev_s", lag(unix_timestamp($"ts"), 1).over(w))
          .filter($"prev_s".isNotNull)
          .select($"event_type",
            (unix_timestamp($"ts") - $"prev_s").as("gap_s"))
        val gh = gaps.groupBy($"event_type", $"gap_s")
          .agg(count(lit(1)).as("c"))
        DistWindow.histCeilRanks(gh, $"event_type", $"gap_s", $"c",
            Seq(50, 90, 99), "event_type", "p", "gap_s_at", "n_gaps")
          .select($"event_type", $"p", $"n_gaps", $"gap_s_at")
          .sortBounded($"event_type", $"p")
      },
      Some("""WITH g0 AS (SELECT event_type, event_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) -
            LAG(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
          FROM events),
        g AS (SELECT event_type, event_id, gap_s FROM g0
          WHERE gap_s IS NOT NULL),
        rk AS (SELECT event_type, gap_s,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY gap_s, event_id) AS r,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM g),
        x AS (SELECT event_type, r, gap_s, n, p.p
          FROM rk CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) p
          WHERE r * 100 >= n * p.p AND (r - 1) * 100 < n * p.p)
        SELECT event_type, p, CAST(MAX(n) AS BIGINT) AS n_gaps,
          MIN(gap_s) AS gap_s_at
        FROM x GROUP BY event_type, p ORDER BY event_type, p""")),

    // ---- last-touch attribution ----------------------------------------
    // Marketing attribution: each purchase is credited to the SAME
    // user's most recent preceding click within a 7-day window; the
    // click's campaign is its JSON props.k mod 10 (the q83-certified
    // extraction). The most-recent-prior match is ops/AsOf — ONE
    // user-keyed shuffle + in-partition sort, never the join-then-
    // filter-max pair blowup — verified against DuckDB's native ASOF
    // JOIN (the q37 contract). Purchases with no in-horizon click
    // report as campaign −1.
    QueryDef(
      "q150_attribution",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts",
            round($"value" * 100).cast("long").as("cents"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts",
            (from_json($"props",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("k",
                  org.apache.spark.sql.types.LongType))))
              .getField("k") % 10).as("campaign"),
            unix_timestamp($"ts").as("click_s"))
        graft.ops.AsOf.join(purchases, clicks, "user_id", "ts", "ts",
            Map("campaign" -> "campaign", "click_s" -> "click_s"))
          .select(
            when($"click_s".isNotNull &&
              unix_timestamp($"ts") - $"click_s" <= 604800L,
              $"campaign").otherwise(-1L).as("campaign"),
            $"cents")
          .groupBy($"campaign")
          .agg(count(lit(1)).as("n_purchases"),
            sum($"cents").as("revenue_cents"))
          .sortBounded($"campaign")
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
            CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
            CASE WHEN json_valid(props) THEN CAST(json_extract(props, '$.k') AS BIGINT) % 10 END AS campaign,
            epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS click_s
          FROM events WHERE event_type = 'click'),
        j AS (SELECT p.cents,
            CASE WHEN c.click_s IS NOT NULL
              AND epoch_us(p.ts) // 1000000 - c.click_s <= 604800
              THEN c.campaign ELSE -1 END AS campaign
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND p.ts >= c.ts)
        SELECT campaign, COUNT(*) AS n_purchases,
          CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM j GROUP BY campaign ORDER BY campaign""")),

    // ---- weekly HLL sketch rollup (mergeable-artifact certification) ---
    // Weekly distinct-user sketches (the q102 HLL register contract,
    // keyed by epoch-week) plus a TOTAL row whose estimate Spark
    // computes by MAX-MERGING the weekly register tables — the
    // persisted-sketch contract: a warehouse keeps per-delivery
    // sketches and merges, never rescans. The ORACLE computes the
    // total row DIRECTLY from the raw rows, so the cross-engine hash
    // match IS the merge-associativity certification (the q131 promise
    // for sketches). Weekly rows also carry the exact distinct count
    // from the same exchange.
    QueryDef(
      "q151_hll_rollup",
      (s, dir) => {
        import s.implicits._
        val wk = floor(unix_timestamp($"ts") / 604800.0).cast("long")
        // ONE events scan + ONE distinct exchange feed all three
        // consumers (round-15: the previous shape re-scanned events per
        // branch — weekly sketch, register table, exact total — tripling
        // the dominant cost). The checkpoint holds only the distinct
        // (user, week) pairs; registers over distinct pairs are
        // identical (max rho is duplicate-blind), as the oracle's own
        // `uw` CTE already models.
        val uw = events(s, dir)
          .select($"user_id", wk.as("wk"))
          .filter($"user_id".isNotNull)
          .distinct()
          .localCheckpoint(false)
        val weekly = graft.ops.Hll.distinctPerGroup(uw, $"wk", $"user_id",
            "week")
          .select($"week", $"n_distinct", $"hll_est")
        val regs = graft.ops.Hll.registers(uw, $"wk", $"user_id", "week")
        val merged = regs.groupBy($"hll_bucket")
          .agg(max($"hll_rho").as("hll_rho"))
          .withColumn("week", lit(-1L))
        val totalEst = graft.ops.Hll.estimateFromRegisters(merged, "week")
        val totalExact = uw.select($"user_id").distinct()
          .agg(count(lit(1)).as("n_distinct")).withColumn("week", lit(-1L))
        val total = totalExact.join(totalEst, Seq("week"))
          .select($"week", $"n_distinct", $"hll_est")
        weekly.unionByName(total).sortBounded($"week")
      },
      Some(raw"""WITH uw AS (SELECT DISTINCT
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk,
            user_id
          FROM events WHERE user_id IS NOT NULL),
        grp AS (SELECT wk AS g, user_id AS v FROM uw
          UNION ALL SELECT -1 AS g, user_id AS v
          FROM (SELECT DISTINCT user_id FROM uw)),
        hx AS (SELECT g, md5(CAST(v AS VARCHAR)) AS h FROM grp),
        reg AS (SELECT g,
            CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS b,
            CASE WHEN length(regexp_extract(substr(h, 3, 13), '^0*')) = 13
              THEN 53
              ELSE length(regexp_extract(substr(h, 3, 13), '^0*')) * 4
                + (CASE WHEN substr(substr(h, 3, 13),
                    length(regexp_extract(substr(h, 3, 13), '^0*')) + 1, 1)
                    IN ('8','9','a','b','c','d','e','f') THEN 0
                  WHEN substr(substr(h, 3, 13),
                    length(regexp_extract(substr(h, 3, 13), '^0*')) + 1, 1)
                    IN ('4','5','6','7') THEN 1
                  WHEN substr(substr(h, 3, 13),
                    length(regexp_extract(substr(h, 3, 13), '^0*')) + 1, 1)
                    IN ('2','3') THEN 2
                  ELSE 3 END) + 1 END AS rho
          FROM hx),
        regs AS (SELECT g, b, MAX(rho) AS mj, CAST(COUNT(*) AS BIGINT)
            AS nt
          FROM reg GROUP BY g, b),
        pg AS (SELECT g, CAST(SUM(nt) AS BIGINT) AS ex,
            CAST(SUM(CAST(POW(2, 53 - mj) AS BIGINT)) AS BIGINT) AS snon,
            CAST(COUNT(*) AS BIGINT) AS nb
          FROM regs GROUP BY g),
        est AS (SELECT g, ex, nb,
            (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
              * 9007199254740992.0
              / CAST(snon + (256 - nb) * 9007199254740992 AS DOUBLE) AS raw
          FROM pg)
        SELECT g AS week, ex AS n_distinct,
          ROUND(CASE WHEN raw <= 640.0 AND nb < 256
            THEN 256.0 * LN(256.0 / CAST(256 - nb AS DOUBLE))
            ELSE raw END, 6) AS hll_est
        FROM est ORDER BY week""")),

    // ---- repeated-span scrub (exact-substring dedup APPLIED) -----------
    // q140 reports the shared spans; this removes them: every ≥12-token
    // run shared with a LOWER-id document is cut from the higher-id
    // copy (first-occurrence-wins, the q20/q60 contract), and the text
    // is rebuilt from surviving tokens with canonical single-space
    // joins. Covered indices union across pairs and overlapping runs
    // in array-land — per-victim state bounded by the document's own
    // token count, never corpus size (Spans.scrubSpans).
    QueryDef(
      "q152_span_scrub_cross",
      (s, dir) => {
        graft.ops.Spans
          .scrubSpans(table(s, dir, "documents"), "text", "doc_id",
            k = 8, minSpan = 12, dfCap = 16)
          .orderBy("doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
              x -> x <> '') AS otoks,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        gl AS (SELECT doc_id, list_transform(range(len(toks) - 7),
            i -> CAST(('0x' || substr(md5(array_to_string(
              list_slice(toks, i + 1, i + 8), ' ')), 1, 15)) AS BIGINT))
            AS gs
          FROM t WHERE len(toks) >= 8),
        gpos AS (SELECT doc_id, unnest(list_transform(range(len(gs)),
            i -> {'pos': i, 'g': gs[i + 1]}), recursive := true)
          FROM gl),
        dfc AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd
            FROM gpos GROUP BY g) WHERE nd BETWEEN 2 AND 16),
        m AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.pos - b.pos AS diag, a.pos AS ia
          FROM gpos a JOIN gpos b USING (g) JOIN dfc USING (g)
          WHERE a.doc_id < b.doc_id),
        runs AS (SELECT doc_a, doc_b, diag, ia,
            ia - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
              ORDER BY ia) AS grp
          FROM m),
        r2 AS (SELECT doc_a, doc_b, diag, grp, COUNT(*) AS run,
            MIN(ia) AS start_a
          FROM runs GROUP BY 1, 2, 3, 4),
        sp AS (SELECT doc_b AS vid, start_a - diag AS start_b,
            run + 7 AS span
          FROM r2 WHERE run >= 5),
        ci AS (SELECT vid, unnest(list_transform(range(span),
            j -> start_b + j)) AS idx
          FROM sp),
        cov AS (SELECT vid, CAST(COUNT(DISTINCT idx) AS BIGINT) AS nrem,
            list(DISTINCT idx) AS cov
          FROM ci GROUP BY vid)
        SELECT d.doc_id, CAST(len(otoks) AS BIGINT) AS n_tokens_before,
          COALESCE(c.nrem, 0) AS n_tokens_removed,
          array_to_string(list_transform(list_filter(
            list_transform(range(len(otoks)),
              i -> {'t': otoks[i + 1], 'i': i}),
            s -> c.cov IS NULL OR NOT list_contains(c.cov, s.i)),
            s -> s.t), ' ') AS text_out
        FROM t d LEFT JOIN cov c ON d.doc_id = c.vid
        ORDER BY d.doc_id""")),

    // ---- DP-noised group counts (seeded Laplace mechanism) -------------
    // The release shape of a differential-privacy count query: per
    // event type, the true count plus Laplace(1/ε) noise, with the
    // uniform draw derived from an md5 of the group key so BOTH engines
    // replay the identical release (a certification of the MECHANISM's
    // arithmetic — a production release would draw real randomness; the
    // inverse-CDF, clamping and single-rounding contract is what's
    // under test). ε = 1; noise = −sign(u−½)·ln(max(1e−12, 1−2|u−½|)).
    QueryDef(
      "q153_dp_counts",
      (s, dir) => {
        import s.implicits._
        events(s, dir)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("u",
            conv(substring(md5(concat(lit("dp:"), $"event_type")), 1, 13),
              16, 10).cast("double") / lit(math.pow(16.0, 13)))
          .withColumn("dp_n", expr("""ROUND(n + (-1.0) * SIGN(u - 0.5) *
            LN(GREATEST(1e-12, 1.0 - 2.0 * ABS(u - 0.5))), 3)"""))
          .select($"event_type", $"n", $"dp_n",
            lit(1.0).as("epsilon"))
          .sortBounded($"event_type")
      },
      Some("""WITH c AS (SELECT event_type, COUNT(*) AS n,
            CAST(('0x' || substr(md5('dp:' || event_type), 1, 13))
              AS BIGINT) / POWER(16, 13) AS u
          FROM events GROUP BY event_type)
        SELECT event_type, n,
          ROUND(n + (-1.0) * SIGN(u - 0.5) *
            LN(GREATEST(1e-12, 1.0 - 2.0 * ABS(u - 0.5))), 3) AS dp_n,
          1.0 AS epsilon
        FROM c ORDER BY event_type""")),

    // ---- conversion lift by lifecycle state ----------------------------
    // Do resurrected users convert like retained ones? Per q141
    // lifecycle state (new/retained/resurrected), the fraction of
    // (user, week) cells with a purchase that week, in exact basis
    // points. One (user, week) pre-agg carries the purchase flag; the
    // state classification happens in the same calendar-bounded
    // array-land pass q141 uses — no per-user window, no second corpus
    // pass.
    QueryDef(
      "q154_state_lift",
      (s, dir) => {
        import s.implicits._
        val wk = floor(unix_timestamp($"ts") / 604800.0).cast("long")
        val uw = events(s, dir)
          .select($"user_id", wk.as("wk"),
            when($"event_type" === "purchase", 1L).otherwise(0L).as("p"))
          .groupBy($"user_id", $"wk").agg(max($"p").as("p"))
        val per = uw.groupBy($"user_id")
          .agg(sort_array(collect_list(struct($"wk", $"p"))).as("es"))
        per
          .select(explode(expr(
            """transform(sequence(0, size(es) - 1), i -> named_struct(
                 'state', CASE WHEN i = 0 THEN 'new'
                   WHEN es[i].wk - es[i-1].wk = 1 THEN 'retained'
                   ELSE 'resurrected' END,
                 'p', es[i].p))""")).as("s"))
          .select($"s.state".as("state"), $"s.p".as("p"))
          .groupBy("state")
          .agg(count(lit(1)).as("n_user_weeks"), sum($"p").as("n_converted"))
          .withColumn("cvr_bp", expr("n_converted * 10000 DIV n_user_weeks"))
          .sortBounded("state")
      },
      Some("""WITH uw AS (SELECT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
          FROM events GROUP BY user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800),
        st AS (SELECT p,
            CASE WHEN LAG(wk) OVER (PARTITION BY user_id ORDER BY wk)
                IS NULL THEN 'new'
              WHEN wk - LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) = 1
                THEN 'retained'
              ELSE 'resurrected' END AS state
          FROM uw)
        SELECT state, COUNT(*) AS n_user_weeks,
          CAST(SUM(p) AS BIGINT) AS n_converted,
          CAST(SUM(p) * 10000 // COUNT(*) AS BIGINT) AS cvr_bp
        FROM st GROUP BY state ORDER BY state""")),

    // ---- first-touch attribution (range-frame formulation) -------------
    // The q150 complement: each purchase credits the EARLIEST click in
    // the preceding 7 days. Expressed as a RANGE frame over the unioned
    // per-user timeline — min over clicks within [t−7d, t] — with the
    // (click_s, campaign) pair packed into one BIGINT (ts·100 +
    // campaign) so the frame min picks earliest-then-lowest-campaign
    // deterministically in both engines. One user-keyed exchange; the
    // frame is time-bounded, so window state per task is horizon-
    // bounded, not history-bounded.
    QueryDef(
      "q155_first_touch",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val k = from_json($"props",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k")
        val tl = ev.filter($"event_type".isin("click", "purchase"))
          .select($"user_id", unix_timestamp($"ts").as("t_s"),
            $"event_type",
            when($"event_type" === "click",
              unix_timestamp($"ts") * 100 + (k % 10)).as("ck"),
            when($"event_type" === "purchase",
              round($"value" * 100).cast("long")).as("cents"))
        val w = Window.partitionBy($"user_id").orderBy($"t_s")
          .rangeBetween(-604800L, 0L)
        tl.withColumn("first_ck", min($"ck").over(w))
          .filter($"event_type" === "purchase")
          .select(
            coalesce($"first_ck" % 100, lit(-1L)).as("campaign"),
            $"cents")
          .groupBy($"campaign")
          .agg(count(lit(1)).as("n_purchases"),
            sum($"cents").as("revenue_cents"))
          .sortBounded($"campaign")
      },
      Some("""WITH tl AS (SELECT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t_s,
            event_type,
            CASE WHEN event_type = 'click'
              THEN (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 100
                + CASE WHEN json_valid(props) THEN CAST(json_extract(props, '$.k') AS BIGINT) % 10 END
              END AS ck,
            CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) END AS cents
          FROM events WHERE event_type IN ('click', 'purchase')),
        fr AS (SELECT event_type, cents,
            MIN(ck) OVER (PARTITION BY user_id ORDER BY t_s
              RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS first_ck
          FROM tl)
        SELECT COALESCE(first_ck % 100, -1) AS campaign,
          COUNT(*) AS n_purchases, CAST(SUM(cents) AS BIGINT)
            AS revenue_cents
        FROM fr WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY campaign""")),

    // ---- join cardinality / blowup audit -------------------------------
    // "Will this join explode?" — the pre-flight a planner runs before
    // shipping a 100 TB join: the EXACT output cardinality of
    // orders ⋈ lineitem from per-key counts alone (Σ nₐ(k)·n_b(k)),
    // the heaviest key's contribution and the skew share in basis
    // points. Only (key, count) pairs shuffle — the join itself never
    // runs — and every aggregate is map-side combinable, so the audit
    // costs two count exchanges whatever the join would produce.
    QueryDef(
      "q160_join_blowup",
      (s, dir) => {
        import s.implicits._
        val a = table(s, dir, "orders")
          .groupBy($"o_orderkey".as("k")).agg(count(lit(1)).as("na"))
        val b = table(s, dir, "lineitem")
          .groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("nb"))
        a.join(b, Seq("k"))
          .select($"k", ($"na" * $"nb").as("prod"))
          .agg(count(lit(1)).as("n_join_keys"),
            sum($"prod").as("join_rows"),
            max($"prod").as("max_key_rows"),
            max_by($"k", $"prod" * lit(4294967296L) + $"k")
              .as("heaviest_key"))
          .withColumn("skew_bp", expr("max_key_rows * 10000 DIV join_rows"))
      },
      Some("""WITH a AS (SELECT o_orderkey AS k, COUNT(*) AS na
          FROM orders GROUP BY o_orderkey),
        b AS (SELECT l_orderkey AS k, COUNT(*) AS nb
          FROM lineitem GROUP BY l_orderkey),
        j AS (SELECT k, na * nb AS prod FROM a JOIN b USING (k))
        SELECT COUNT(*) AS n_join_keys,
          CAST(SUM(prod) AS BIGINT) AS join_rows,
          CAST(MAX(prod) AS BIGINT) AS max_key_rows,
          CAST(arg_max(k, prod * 4294967296 + k) AS BIGINT)
            AS heaviest_key,
          CAST(MAX(prod) * 10000 // SUM(prod) AS BIGINT) AS skew_bp
        FROM j""")),

    // ---- session depth vs conversion -----------------------------------
    // Do longer sessions convert? Per depth bucket (1 / 2 / 3-4 / 5-7 /
    // 8+ events), the fraction of q19 sessions containing a purchase,
    // in exact basis points. Session id and the purchase flag both ride
    // the single user-partitioned window exchange; the session rollup
    // is a combinable (user, session) aggregation and the bucket table
    // is 5 rows.
    QueryDef(
      "q165_session_depth",
      (s, dir) => {
        import s.implicits._
        val sess = graft.ops.Behavior.withSessionIds(events(s, dir))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("depth"),
            max(when($"event_type" === "purchase", 1L).otherwise(0L))
              .as("conv"))
        sess
          .withColumn("bucket",
            when($"depth" === 1, "1").when($"depth" === 2, "2")
              .when($"depth" <= 4, "3-4").when($"depth" <= 7, "5-7")
              .otherwise("8+"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_sessions"), sum($"conv").as("n_converted"))
          .withColumn("cvr_bp", expr("n_converted * 10000 DIV n_sessions"))
          .sortBounded($"bucket")
      },
      Some("""WITH m AS (SELECT user_id, event_id, event_type, ts,
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_ts,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS rn
          FROM events),
        mk AS (SELECT *, CASE WHEN prev_ts IS NULL
              OR (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
               - (epoch_us(CAST(prev_ts AS TIMESTAMP)) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_session
          FROM m),
        sess AS (SELECT user_id, event_type,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY rn
              ROWS UNBOUNDED PRECEDING) AS session_id
          FROM mk),
        agg AS (SELECT user_id, session_id, COUNT(*) AS depth,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM sess GROUP BY user_id, session_id),
        b AS (SELECT CASE WHEN depth = 1 THEN '1' WHEN depth = 2 THEN '2'
              WHEN depth <= 4 THEN '3-4' WHEN depth <= 7 THEN '5-7'
              ELSE '8+' END AS bucket, conv
          FROM agg)
        SELECT bucket, COUNT(*) AS n_sessions,
          CAST(SUM(conv) AS BIGINT) AS n_converted,
          CAST(SUM(conv) * 10000 // COUNT(*) AS BIGINT) AS cvr_bp
        FROM b GROUP BY bucket ORDER BY bucket""")),

    // ---- weekly stickiness (DAU/WAU) -----------------------------------
    // Per epoch-week: mean daily actives over the week's 7 days,
    // weekly actives, and stickiness = avg-DAU/WAU in basis points —
    // the engagement ratio a product dashboard leads with. Two distinct
    // pre-aggregations ((user, day) and (user, week)), both map-side
    // combinable, rolled up to a calendar-sized table; the averaging
    // uses the FIXED 7-day week so both engines divide identically.
    QueryDef(
      "q166_stickiness",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val day = expr("unix_timestamp(ts) DIV 86400")
        val dau = ev.select($"user_id", day.as("d")).distinct()
          .withColumn("wk", expr("d DIV 7"))
          .groupBy($"wk").agg(count(lit(1)).as("user_days"))
        val wau = ev.select($"user_id",
            expr("unix_timestamp(ts) DIV 604800").as("wk")).distinct()
          .groupBy($"wk").agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("wk"))
          .select($"wk".as("week"), $"user_days", $"wau",
            expr("user_days * 10000 DIV (7 * wau)").as("stickiness_bp"))
          .sortBounded($"week")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 86400 AS d
          FROM events),
        dau AS (SELECT d // 7 AS wk, COUNT(*) AS user_days FROM ud
          GROUP BY d // 7),
        uw AS (SELECT DISTINCT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk
          FROM events),
        wau AS (SELECT wk, COUNT(*) AS wau FROM uw GROUP BY wk)
        SELECT wk AS week, user_days, wau,
          CAST(user_days * 10000 // (7 * wau) AS BIGINT) AS stickiness_bp
        FROM dau JOIN wau USING (wk) ORDER BY week""")),

    // ---- p-chart error-rate monitor (SPC) ------------------------------
    // Shewhart attribute chart over the event stream: per week, the
    // error share against the corpus-wide center line, with ±3σ
    // binomial control limits σ = √(p̄(1−p̄)/n) and a breach flag — the
    // statistical-process-control read an on-call dashboard plots. One
    // combinable per-week aggregation + a 1-row center-line broadcast;
    // limits are the one double formula from exact integers, rounded
    // once to micro units, and the breach verdict compares micro ints
    // so both engines flag identical weeks.
    QueryDef(
      "q167_pchart_errors",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val wk = expr("unix_timestamp(ts) DIV 604800")
        val per = ev.select(wk.as("week"),
            when($"event_type" === "error", 1L).otherwise(0L).as("e"))
          .groupBy($"week")
          .agg(count(lit(1)).as("n_events"), sum($"e").as("n_errors"))
        val center = per.agg(sum($"n_events").as("tn"),
          sum($"n_errors").as("te"))
        per.crossJoin(broadcast(center))
          .withColumn("pbar", $"te".cast("double") / $"tn")
          .withColumn("sig",
            sqrt($"pbar" * (lit(1.0) - $"pbar") / $"n_events"))
          .select($"week", $"n_events", $"n_errors",
            expr("n_errors * 10000 DIV n_events").as("err_bp"),
            expr("CAST(ROUND((pbar + 3 * sig) * 1000000) AS BIGINT)")
              .as("ucl_micro"),
            expr("CAST(ROUND(GREATEST(0.0, pbar - 3 * sig) * 1000000) AS BIGINT)")
              .as("lcl_micro"),
            (expr("CAST(ROUND(CAST(n_errors AS DOUBLE) / n_events * 1000000) AS BIGINT)")
              > expr("CAST(ROUND((pbar + 3 * sig) * 1000000) AS BIGINT)") ||
             expr("CAST(ROUND(CAST(n_errors AS DOUBLE) / n_events * 1000000) AS BIGINT)")
              < expr("CAST(ROUND(GREATEST(0.0, pbar - 3 * sig) * 1000000) AS BIGINT)"))
              .as("breach"))
          .sortBounded($"week")
      },
      Some("""WITH per AS (SELECT
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS week,
            COUNT(*) AS n_events,
            CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
          FROM events GROUP BY 1),
        c AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tn,
            CAST(SUM(n_errors) AS BIGINT) AS te FROM per),
        x AS (SELECT week, n_events, n_errors,
            CAST(te AS DOUBLE) / tn AS pbar,
            SQRT((CAST(te AS DOUBLE) / tn) * (1.0 - CAST(te AS DOUBLE) / tn)
              / n_events) AS sig
          FROM per CROSS JOIN c)
        SELECT week, n_events, n_errors,
          CAST(n_errors * 10000 // n_events AS BIGINT) AS err_bp,
          CAST(ROUND((pbar + 3 * sig) * 1000000) AS BIGINT) AS ucl_micro,
          CAST(ROUND(GREATEST(0.0, pbar - 3 * sig) * 1000000) AS BIGINT)
            AS lcl_micro,
          (CAST(ROUND(CAST(n_errors AS DOUBLE) / n_events * 1000000)
              AS BIGINT)
            > CAST(ROUND((pbar + 3 * sig) * 1000000) AS BIGINT))
          OR (CAST(ROUND(CAST(n_errors AS DOUBLE) / n_events * 1000000)
              AS BIGINT)
            < CAST(ROUND(GREATEST(0.0, pbar - 3 * sig) * 1000000)
              AS BIGINT)) AS breach
        FROM x ORDER BY week""")),

    // ---- CUPED variance reduction for the A/B read ---------------------
    // Deng et al. 2013, the industry experiment-sensitivity standard:
    // adjust the outcome (post-period purchase cents, weeks ≥ 2) by the
    // pre-period covariate (weeks 0-1) with θ = cov(X,Y)/var(X), and
    // report the variance-reduction share (= corr² in bp). One
    // user-keyed combinable aggregation builds (X, Y) per user (period
    // split against a 1-row min-week broadcast), θ and the moments come
    // from five exact integer sums, and the q145 md5-parity arms reuse
    // the same hash contract — everything downstream of the user table
    // is a handful of 1-row aggregates.
    QueryDef(
      "q168_cuped",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val wk = expr("unix_timestamp(ts) DIV 604800")
        val minW = ev.agg(min(wk).as("w0"))
        val per = ev.select($"user_id", wk.as("wk"),
            when($"event_type" === "purchase",
              round($"value" * 100).cast("long")).otherwise(0L).as("cents"))
          .crossJoin(broadcast(minW))
          .groupBy($"user_id")
          .agg(sum(when($"wk" - $"w0" < 2, $"cents").otherwise(0L)).as("x"),
            sum(when($"wk" - $"w0" >= 2, $"cents").otherwise(0L)).as("y"))
          .withColumn("arm",
            conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
              .cast("long") % 2)
        val m = per.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"y").as("sy"), sum($"x" * $"x").as("sxx"),
          sum($"x" * $"y").as("sxy"), sum($"y" * $"y").as("syy"))
          .withColumn("theta",
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              ($"n" * $"sxx" - $"sx" * $"sx"))
          .withColumn("corr2",
            (($"n" * $"sxy" - $"sx" * $"sy").cast("double") *
              ($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
            (($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
              ($"n" * $"syy" - $"sy" * $"sy").cast("double")))
        per.crossJoin(broadcast(m))
          .withColumn("adj",
            $"y" - $"theta" * ($"x" - $"sx".cast("double") / $"n"))
          .groupBy()
          .agg(max($"n").as("n_users"),
            expr("CAST(ROUND(MAX(theta) * 1000000) AS BIGINT)")
              .as("theta_micro"),
            expr("CAST(ROUND(MAX(corr2) * 10000) AS BIGINT)")
              .as("var_reduction_bp"),
            expr("""CAST(ROUND(SUM(CASE WHEN arm = 0 THEN adj END)
              / SUM(CASE WHEN arm = 0 THEN 1 END) * 1000) AS BIGINT)""")
              .as("adj_mean_a_milli"),
            expr("""CAST(ROUND(SUM(CASE WHEN arm = 1 THEN adj END)
              / SUM(CASE WHEN arm = 1 THEN 1 END) * 1000) AS BIGINT)""")
              .as("adj_mean_b_milli"))
      },
      Some("""WITH w0 AS (SELECT MIN(
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800) AS w0
          FROM events),
        per AS (SELECT user_id,
            CAST(SUM(CASE WHEN
              (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 - w0 < 2
              AND event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN
              (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 - w0 >= 2
              AND event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y,
            CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS arm
          FROM events CROSS JOIN w0 GROUP BY user_id),
        m AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
            CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(y * y) AS BIGINT) AS syy
          FROM per),
        t AS (SELECT n, sx,
            CAST(n * sxy - sx * sy AS DOUBLE) /
              CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
            (CAST(n * sxy - sx * sy AS DOUBLE) *
              CAST(n * sxy - sx * sy AS DOUBLE)) /
              (CAST(n * sxx - sx * sx AS DOUBLE) *
               CAST(n * syy - sy * sy AS DOUBLE)) AS corr2
          FROM m)
        SELECT CAST(t.n AS BIGINT) AS n_users,
          CAST(ROUND(t.theta * 1000000) AS BIGINT) AS theta_micro,
          CAST(ROUND(t.corr2 * 10000) AS BIGINT) AS var_reduction_bp,
          CAST(ROUND(SUM(CASE WHEN arm = 0 THEN
              y - t.theta * (x - CAST(t.sx AS DOUBLE) / t.n) END)
            / SUM(CASE WHEN arm = 0 THEN 1 END) * 1000) AS BIGINT)
            AS adj_mean_a_milli,
          CAST(ROUND(SUM(CASE WHEN arm = 1 THEN
              y - t.theta * (x - CAST(t.sx AS DOUBLE) / t.n) END)
            / SUM(CASE WHEN arm = 1 THEN 1 END) * 1000) AS BIGINT)
            AS adj_mean_b_milli
        FROM per CROSS JOIN t
        GROUP BY t.n, t.theta, t.corr2, t.sx""")),

    // ---- experiment sample-size planner --------------------------------
    // Before launching the q145 test: users per arm needed to detect a
    // 5% lift in per-user purchase value at α=0.05 (two-sided) and 80%
    // power — n = (z_{α/2}+z_β)²·2σ²/δ² with the observed per-user
    // variance and mean from exact integer sums, z constants fixed, and
    // one ceiling at the end. Two 1-row aggregates over the user table.
    QueryDef(
      "q169_sample_size",
      (s, dir) => {
        import s.implicits._
        val per = events(s, dir)
          .select($"user_id",
            when($"event_type" === "purchase",
              round($"value" * 100).cast("long")).otherwise(0L).as("cents"))
          .groupBy($"user_id").agg(sum($"cents").as("v"))
        per.agg(count(lit(1)).as("n"), sum($"v").as("sv"),
            sum($"v" * $"v").as("svv"))
          .withColumn("mean", $"sv".cast("double") / $"n")
          .withColumn("variance",
            ($"n" * $"svv" - $"sv" * $"sv").cast("double") /
              ($"n".cast("double") * ($"n" - 1)))
          .select($"n".as("n_users_observed"),
            expr("CAST(ROUND(mean) AS BIGINT)").as("mean_cents"),
            expr("CAST(ROUND(SQRT(variance)) AS BIGINT)").as("sd_cents"),
            expr("""CAST(CEIL((1.959964 + 0.841621) * (1.959964 + 0.841621)
              * 2 * variance / ((0.05 * mean) * (0.05 * mean)))
              AS BIGINT)""").as("n_per_arm_needed"))
      },
      Some("""WITH per AS (SELECT user_id,
            CAST(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS v
          FROM events GROUP BY user_id),
        m AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv,
            CAST(SUM(v * v) AS BIGINT) AS svv FROM per),
        x AS (SELECT n, CAST(sv AS DOUBLE) / n AS mean,
            CAST(n * svv - sv * sv AS DOUBLE) /
              (CAST(n AS DOUBLE) * (n - 1)) AS variance
          FROM m)
        SELECT CAST(n AS BIGINT) AS n_users_observed,
          CAST(ROUND(mean) AS BIGINT) AS mean_cents,
          CAST(ROUND(SQRT(variance)) AS BIGINT) AS sd_cents,
          CAST(CEIL((1.959964 + 0.841621) * (1.959964 + 0.841621)
            * 2 * variance / ((0.05 * mean) * (0.05 * mean))) AS BIGINT)
            AS n_per_arm_needed
        FROM x""")),

    // ---- retention half-life fit ---------------------------------------
    // Summarize the q136 matrix as ONE number: fit retention_bp ≈
    // 10000·e^(−λ·offset) by log-linear least squares over the
    // offset ≥ 1 cells pooled across cohorts (weighted implicitly by
    // cell count), and report λ and the half-life ln2/λ in centi-weeks.
    // The matrix is calendar²-sized, so the fit is a 1-row aggregate
    // over a tiny relation; the heavy lifting is q136's single
    // user-keyed exchange.
    QueryDef(
      "q170_retention_halflife",
      (s, dir) => {
        import s.implicits._
        val cells = graft.ops.Behavior
          .retentionCohorts(events(s, dir), "user_id",
            unix_timestamp(col("ts")))
          .filter($"week_offset" >= 1 && $"retention_bp" > 0)
          .select($"week_offset".cast("double").as("x"),
            log($"retention_bp".cast("double") / 10000.0).as("y"))
        cells
          .agg(count(lit(1)).as("k"), sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
          .withColumn("lambda",
            -(($"k" * $"sxy" - $"sx" * $"sy") /
              ($"k" * $"sxx" - $"sx" * $"sx")))
          .select($"k".as("n_cells"),
            expr("CAST(ROUND(lambda * 1000000) AS BIGINT)")
              .as("lambda_micro"),
            // λ ≤ 0 = no measurable decay (flat or rising retention):
            // half-life undefined, report the −1 sentinel
            expr("""CASE WHEN lambda <= 0 THEN -1
              ELSE CAST(ROUND(LN(2) / lambda * 100) AS BIGINT) END""")
              .as("half_life_centiweeks"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS wk
          FROM events),
        c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw
          GROUP BY user_id),
        cell AS (SELECT cohort_week, wk - cohort_week AS week_offset,
            COUNT(*) AS n_users
          FROM uw JOIN c USING (user_id) GROUP BY 1, 2),
        r AS (SELECT cohort_week, week_offset,
            CAST(n_users * 10000 // (MAX(CASE WHEN week_offset = 0
              THEN n_users END) OVER (PARTITION BY cohort_week))
              AS BIGINT) AS retention_bp
          FROM cell),
        pts AS (SELECT CAST(week_offset AS DOUBLE) AS x,
            LN(CAST(retention_bp AS DOUBLE) / 10000.0) AS y
          FROM r WHERE week_offset >= 1 AND retention_bp > 0),
        f AS (SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
            SUM(x * x) AS sxx, SUM(x * y) AS sxy FROM pts),
        l AS (SELECT k, -((k * sxy - sx * sy) / (k * sxx - sx * sx))
            AS lambda FROM f)
        SELECT CAST(k AS BIGINT) AS n_cells,
          CAST(ROUND(lambda * 1000000) AS BIGINT) AS lambda_micro,
          CASE WHEN lambda <= 0 THEN -1
            ELSE CAST(ROUND(LN(2) / lambda * 100) AS BIGINT) END
            AS half_life_centiweeks
        FROM l""")),

    // ---- weekly purchase-value percentile bands ------------------------
    // The metric-over-time monitoring read: per week, exact p50/p90 of
    // purchase value in cents — percentile bands a dashboard plots to
    // catch distribution shifts the mean hides. Purchases collapse to a
    // (week, cents) COUNT HISTOGRAM with one combinable aggregation
    // (cents is domain-bounded — the price range, not the corpus) and
    // DistWindow.histCeilRanks picks both percentiles from one per-week
    // window over it, at the same ceil-rank position the oracle's
    // r·100 ≥ n·p > (r−1)·100 inequality selects (an id tie-break never
    // changes which VALUE sits at a position).
    QueryDef(
      "q171_weekly_bands",
      (s, dir) => {
        import s.implicits._
        val wk = expr("unix_timestamp(ts) DIV 604800")
        val ph = events(s, dir).filter($"event_type" === "purchase")
          .select(wk.as("week"),
            round($"value" * 100).cast("long").as("cents"))
          .groupBy($"week", $"cents").agg(count(lit(1)).as("c"))
        DistWindow.histCeilRanks(ph, col("week"), $"cents", $"c",
            Seq(50, 90), "week", "p", "cents_at", "n_purchases")
          .select($"week", $"p", $"n_purchases", $"cents_at")
          .sortBounded($"week", $"p")
      },
      Some("""WITH p AS (SELECT
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 604800 AS week,
            event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        rk AS (SELECT week, cents,
            ROW_NUMBER() OVER (PARTITION BY week ORDER BY cents, event_id)
              AS r,
            COUNT(*) OVER (PARTITION BY week) AS n
          FROM p),
        x AS (SELECT week, r, cents, n, t.p
          FROM rk CROSS JOIN (SELECT unnest([50, 90]) AS p) t
          WHERE r * 100 >= n * p AND (r - 1) * 100 < n * p)
        SELECT week, p, CAST(MAX(n) AS BIGINT) AS n_purchases,
          MIN(cents) AS cents_at
        FROM x GROUP BY week, p ORDER BY week, p""")),

    // ---- lag-1 autocorrelation of daily volume -------------------------
    // Is traffic momentum or noise? The lag-1 autocorrelation of the
    // daily event-count series, exactly: the corpus collapses to a
    // calendar-sized daily table (one combinable agg), consecutive days
    // pair by a self-join on day+1 (dense calendar), and r₁ comes from
    // exact integer sums with one closing division — the time-series
    // diagnostic behind every anomaly-detection default.
    QueryDef(
      "q172_autocorr_daily",
      (s, dir) => {
        import s.implicits._
        val day = expr("unix_timestamp(ts) DIV 86400")
        val daily = events(s, dir).select(day.as("d"))
          .groupBy($"d").agg(count(lit(1)).as("c"))
        val pairs = daily
          .join(daily.select(($"d" - 1).as("d"), $"c".as("cn")), Seq("d"))
        pairs
          .agg(count(lit(1)).as("np"), sum($"c").as("sx"),
            sum($"cn").as("sy"), sum($"c" * $"c").as("sxx"),
            sum($"cn" * $"cn").as("syy"), sum($"c" * $"cn").as("sxy"))
          .select($"np".as("n_pairs"),
            expr("""CAST(ROUND(
              (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              SQRT((CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                   (CAST(np AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
              * 1000000) AS BIGINT)""").as("r1_micro"))
      },
      Some("""WITH daily AS (SELECT
            (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 86400 AS d,
            COUNT(*) AS c
          FROM events GROUP BY 1),
        pairs AS (SELECT a.c, b.c AS cn
          FROM daily a JOIN daily b ON b.d = a.d + 1),
        m AS (SELECT COUNT(*) AS np, CAST(SUM(c) AS BIGINT) AS sx,
            CAST(SUM(cn) AS BIGINT) AS sy,
            CAST(SUM(c * c) AS BIGINT) AS sxx,
            CAST(SUM(cn * cn) AS BIGINT) AS syy,
            CAST(SUM(c * cn) AS BIGINT) AS sxy
          FROM pairs)
        SELECT CAST(np AS BIGINT) AS n_pairs,
          CAST(ROUND(
            (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
            SQRT((CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                 (CAST(np AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
            * 1000000) AS BIGINT) AS r1_micro
        FROM m""")),

    // ---- weekday seasonality profile -----------------------------------
    // Day-of-week traffic shape: events per ISO weekday (1=Mon..7=Sun)
    // against the uniform expectation, as an exact basis-point index
    // (10000 = flat). Weekday derives from epoch days ((d+3) mod 7 + 1
    // — epoch day 0 was a Thursday = ISO 4), so both engines bucket
    // without any locale/timezone surface; one combinable aggregation
    // + a 1-row total broadcast.
    QueryDef(
      "q173_weekday_profile",
      (s, dir) => {
        import s.implicits._
        val dow = expr("(unix_timestamp(ts) DIV 86400 + 3) % 7 + 1")
        val per = events(s, dir).select(dow.as("weekday"))
          .groupBy($"weekday").agg(count(lit(1)).as("n_events"))
        val tot = per.agg(sum($"n_events").as("tn"))
        per.crossJoin(broadcast(tot))
          .select($"weekday", $"n_events",
            expr("n_events * 7 * 10000 DIV tn").as("index_bp"))
          .sortBounded($"weekday")
      },
      Some("""WITH per AS (SELECT
            ((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 86400 + 3)
              % 7 + 1 AS weekday,
            COUNT(*) AS n_events
          FROM events GROUP BY 1),
        t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tn FROM per)
        SELECT weekday, n_events,
          CAST(n_events * 7 * 10000 // tn AS BIGINT) AS index_bp
        FROM per CROSS JOIN t ORDER BY weekday""")),

    // ---- detectable-lift curve (q169's inverse) ------------------------
    // Given the observed variance, what lift CAN each sample size
    // detect? MDE as a fraction of the mean at n ∈ {0.5×, 1×, 2×, 5×,
    // 10×} the observed per-arm population — δ = (z_{α/2}+z_β)·σ·√(2/n)
    // — in basis points of the mean, each row one closed-form
    // evaluation off the same 1-row moment aggregate.
    QueryDef(
      "q174_mde_curve",
      (s, dir) => {
        import s.implicits._
        val per = events(s, dir)
          .select($"user_id",
            when($"event_type" === "purchase",
              round($"value" * 100).cast("long")).otherwise(0L).as("cents"))
          .groupBy($"user_id").agg(sum($"cents").as("v"))
        per.agg(count(lit(1)).as("n"), sum($"v").as("sv"),
            sum($"v" * $"v").as("svv"))
          .withColumn("mean", $"sv".cast("double") / $"n")
          .withColumn("variance",
            ($"n" * $"svv" - $"sv" * $"sv").cast("double") /
              ($"n".cast("double") * ($"n" - 1)))
          .select($"n", $"mean", $"variance",
            explode(array(lit(0.5), lit(1.0), lit(2.0), lit(5.0),
              lit(10.0))).as("mult"))
          .select(
            expr("CAST(ROUND(n * mult) AS BIGINT)").as("n_per_arm"),
            expr("""CAST(ROUND((1.959964 + 0.841621)
              * SQRT(variance * 2.0 / (n * mult)) / mean * 10000)
              AS BIGINT)""").as("mde_bp"))
          .sortBounded($"n_per_arm")
      },
      Some("""WITH per AS (SELECT user_id,
            CAST(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS v
          FROM events GROUP BY user_id),
        m AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv,
            CAST(SUM(v * v) AS BIGINT) AS svv FROM per),
        x AS (SELECT n, CAST(sv AS DOUBLE) / n AS mean,
            CAST(n * svv - sv * sv AS DOUBLE) /
              (CAST(n AS DOUBLE) * (n - 1)) AS variance
          FROM m),
        s AS (SELECT x.*, t.mult
          FROM x CROSS JOIN (SELECT unnest([0.5, 1.0, 2.0, 5.0, 10.0])
            AS mult) t)
        SELECT CAST(ROUND(n * mult) AS BIGINT) AS n_per_arm,
          CAST(ROUND((1.959964 + 0.841621)
            * SQRT(variance * 2.0 / (n * mult)) / mean * 10000)
            AS BIGINT) AS mde_bp
        FROM s ORDER BY n_per_arm"""))
  )
}
