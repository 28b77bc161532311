package graft.oracle

import graft.ops.TextOps

/** DuckDB oracle SQL for the extension operators (events, text,
  * dedup, similarity, multimodal). Mirrors the Spark plans
  * expression-for-expression; hash/threshold constants are shared with
  * the Scala side where practical (TextOps marker lists).
  *
  * HOUSE RULE — integer aggregates: DuckDB widens `sum(INTEGER/BIGINT)`
  * (and integer-expression sums like `sum(a - b)`) to HUGEINT (int128),
  * while the Spark twin emits int64; the driver's hash compare is
  * type-sensitive, so identical VALUES still hash-mismatch. EVERY
  * integer `sum(...)` that reaches an OUTPUT column must be wrapped
  * `CAST(sum(...) AS BIGINT)` (or `AS DOUBLE` for ratio outputs).
  * `count(*)`/`min`/`max` stay BIGINT and need no wrap; intermediate
  * sums consumed only by comparisons or divisions are exempt.
  */
object ExtSql {

  private def sqlList(xs: Seq[String]): String = xs.map("'" + _ + "'").mkString(", ")

  // ---------- events ----------

  val eventsHourly: String = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS "HourTs",
       event_type,
       count(*) AS "NEvents",
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "TotalValue"
FROM events GROUP BY 1, 2 ORDER BY "HourTs", event_type
"""

  /** Engagement-card mirror: same user-day dedupe, same bounded
    * window explode (`range(0, 7)` days ahead), same exact counts and
    * one IEEE divide. Day keys ride ISO strings like HourTs. */
  val eventsActiveUsers: String = {
    val w = graft.ops.EventsOps.ActiveWindowDays
    s"""
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS ndau FROM ud GROUP BY day),
wexp AS (
  SELECT DISTINCT day + CAST(t.i AS INTEGER) AS day, user_id
  FROM ud CROSS JOIN range(0, $w) t(i)
),
wau AS (SELECT day, CAST(count(*) AS BIGINT) AS nwau FROM wexp GROUP BY day)
SELECT strftime(d.day, '%Y-%m-%d') AS "Day", d.ndau AS "DAU", w.nwau AS "WAU",
       CAST(d.ndau AS DOUBLE) / w.nwau AS "Stickiness"
FROM dau d JOIN wau w ON d.day = w.day ORDER BY "Day"
"""
  }

  val eventsJsonStats: String = """
WITH e AS (
  SELECT event_type,
         TRY_CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS INTEGER) AS k
  FROM events
)
SELECT event_type, count(*) AS "NEvents",
       CAST(sum(k) AS BIGINT) AS "SumK", min(k) AS "MinK", max(k) AS "MaxK"
FROM e GROUP BY event_type ORDER BY event_type
"""

  /** Hourly-anomaly mirror: identical hour-of-day × type baseline and
    * the identical two-sided cross-multiplied integer z-rule. Sums are
    * CAST BIGINT before the squares so the arithmetic matches Spark's
    * int64 exactly. */
  val eventsHourlyAnomalies: String = {
    val s2 = graft.ops.EventsOps.AnomalySigmas * graft.ops.EventsOps.AnomalySigmas
    s"""
WITH hc AS (
  SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
),
hcb AS (SELECT *, CAST(hour(hr) AS INTEGER) AS hod FROM hc),
bl AS (
  SELECT hod, event_type, count(*) AS bn,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM hcb GROUP BY hod, event_type
)
SELECT strftime(h.hr, '%Y-%m-%d %H:%M:%S') AS "HourTs",
       h.event_type, h.c AS "NEvents", h.hod AS "HourOfDay",
       b.bn AS "BucketN",
       h.c * b.bn - b.sc AS "DevQ",
       ((h.c * b.bn - b.sc) * (h.c * b.bn - b.sc) > $s2 * (b.bn * b.sc2 - b.sc * b.sc)) AS "IsAnomaly"
FROM hcb h JOIN bl b ON h.hod = b.hod AND h.event_type = b.event_type
ORDER BY "HourTs", h.event_type
"""
  }

  /** Distribution-card mirror: quantile_cont ≡ Spark's percentile
    * interpolation; identical quantized-long mean; identical bucket
    * arithmetic (every step exactly-rounded on identical doubles). */
  val eventsValueDistribution: String = {
    val b = graft.ops.EventsOps.DistBuckets
    val hist = (0 until b).map(i =>
      s"""CAST(sum(CASE WHEN bkt = $i THEN 1 ELSE 0 END) AS BIGINT) AS "H$i"""")
      .mkString(",\n         ")
    s"""
WITH st AS (
  SELECT event_type, count(*) AS n,
         min(value) AS minv, max(value) AS maxv,
         quantile_cont(value, 0.5) AS p50,
         quantile_cont(value, 0.9) AS p90,
         quantile_cont(value, 0.99) AS p99,
         CAST(sum(CAST(floor(value * 1e9) AS BIGINT)) AS DOUBLE) / count(*) / 1e9 AS avgv
  FROM events GROUP BY event_type
),
bk AS (
  SELECT e.event_type,
         CASE WHEN st.maxv = st.minv THEN 0
              ELSE least($b - 1, CAST(floor((e.value - st.minv) * $b / (st.maxv - st.minv)) AS INTEGER))
         END AS bkt
  FROM events e JOIN st ON e.event_type = st.event_type
),
h AS (
  SELECT event_type,
         $hist
  FROM bk GROUP BY event_type
)
SELECT st.event_type, st.n AS "N", st.minv AS "MinV", st.maxv AS "MaxV",
       st.p50 AS "P50", st.p90 AS "P90", st.p99 AS "P99",
       st.avgv AS "AvgValue",
       ${(0 until b).map(i => s""""H$i"""").mkString(", ")}
FROM st JOIN h ON st.event_type = h.event_type
ORDER BY st.event_type
"""
  }

  val eventsDedupLatest: String = """
WITH r AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS "LastTs", event_type, value
FROM r WHERE rn = 1 ORDER BY user_id
"""

  val eventsSessionize: String = """
WITH e AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id,
         CASE WHEN prev IS NULL OR date_diff('microseconds', prev, ts) > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM e
)
SELECT user_id, count(*) AS "NEvents", CAST(sum(ns) AS BIGINT) AS "NSessions"
FROM s GROUP BY user_id ORDER BY user_id
"""

  /** Path-top-k mirror: the same 30-minute sessionization (lag +
    * explicit ROWS-framed running sum — frame pinned on both sides so
    * tie semantics cannot differ), the same session-checked double
    * lead, identical integer counts and total order. */
  val eventsPathTopk: String = {
    val k = graft.ops.EventsOps.PathTopK
    s"""
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
x AS (
  SELECT user_id, event_id, event_type, ts,
         sum(CASE WHEN prev IS NULL OR date_diff('microseconds', prev, ts) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
),
t AS (
  SELECT user_id, sess, event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3,
         lead(sess, 2) OVER w AS ss3
  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tr AS (SELECT user_id, sess, s1, s2, s3 FROM t WHERE ss3 = sess),
occ AS (SELECT s1, s2, s3, count(*) AS n FROM tr GROUP BY s1, s2, s3),
sn AS (SELECT s1, s2, s3, count(*) AS ns
       FROM (SELECT DISTINCT user_id, sess, s1, s2, s3 FROM tr) d
       GROUP BY s1, s2, s3)
SELECT occ.s1 AS "Step1", occ.s2 AS "Step2", occ.s3 AS "Step3",
       CAST(occ.n AS BIGINT) AS "NOccurrences", CAST(sn.ns AS BIGINT) AS "NSessions"
FROM occ JOIN sn ON occ.s1 = sn.s1 AND occ.s2 = sn.s2 AND occ.s3 = sn.s3
ORDER BY occ.n DESC, occ.s1, occ.s2, occ.s3
LIMIT $k
"""
  }

  /** Transition-matrix mirror: the pathTopk sessionization, one lead,
    * identical integer pair counts, From totals via the same
    * partition window, probability as the same single division. */
  val eventsTransitionMatrix: String = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
x AS (
  SELECT user_id, event_id, event_type, ts,
         sum(CASE WHEN prev IS NULL OR date_diff('microseconds', prev, ts) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
),
t AS (
  SELECT event_type AS f,
         lead(event_type, 1) OVER w AS tt,
         lead(sess, 1) OVER w AS s2, sess
  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
p AS (SELECT f, tt FROM t WHERE s2 = sess),
c AS (SELECT f, tt, count(*) AS n FROM p GROUP BY f, tt),
m AS (SELECT f, tt, n, sum(n) OVER (PARTITION BY f) AS ft FROM c)
SELECT f AS "From", tt AS "To", CAST(n AS BIGINT) AS "NTransitions",
       CAST(ft AS BIGINT) AS "FromTotal",
       CAST(n AS DOUBLE) / ft AS "Prob"
FROM m ORDER BY f, tt
"""

  /** Funnel mirror: the window bound is interpolated from
    * [[graft.ops.EventsOps.FunnelWindowHours]] so the two sides cannot
    * drift; instants are epoch_us == the Spark side's ts_ns div 1000. */
  val eventsFunnel: String = {
    val winUs = graft.ops.EventsOps.FunnelWindowHours * 3600L * 1000000L
    s"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.us > v.t1 AND e.us <= v.t1 + $winUs
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.us > c.t2 AND e.us <= c.t2 + $winUs
      GROUP BY e.user_id),
steps AS (
  SELECT 1 AS s, 'view' AS sn, count(*) AS u FROM v
  UNION ALL SELECT 2, 'view>click', count(*) FROM c
  UNION ALL SELECT 3, 'view>click>purchase', count(*) FROM p)
SELECT s AS "Step", sn AS "StepName", u AS "Users",
       CAST(u AS DOUBLE) / nullif(first_value(u) OVER (ORDER BY s), 0) AS "CumRate",
       CAST(u AS DOUBLE) / nullif(lag(u) OVER (ORDER BY s), 0) AS "StepRate"
FROM steps ORDER BY s
"""
  }

  /** Interval-join mirror: DuckDB gets the declarative BETWEEN form
    * (its optimizer handles small interval joins fine); Spark runs the
    * bin-and-replicate plan — identical values, different physical
    * strategy, which is the point. Bands come from RelationalOps so
    * the two sides cannot drift. */
  val rangeJoinValueBands: String = {
    val vals = graft.ops.RelationalOps.ValueBands
      .map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")
    s"""
WITH bands(band, lo, hi) AS (VALUES $vals)
SELECT band AS "Band", lo AS "Lo", hi AS "Hi",
       count(*) AS "NEvents",
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "TotalValue"
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band, lo, hi
ORDER BY lo
"""
  }

  // ---------- text ----------

  private val toksCte = """
WITH toks AS (
  SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
)"""

  /** Distinct n-token shingles over the token array `t` — the DuckDB
    * transcription of `token_shingles(text, n)`. */
  private def shExprN(n: Int): String = {
    val window = (0 until n)
      .map(j => if (j == 0) "t[i]" else s"t[i+$j]").mkString(" || ' ' || ")
    s"list_distinct([$window for i in range(1, len(t)-${n - 2})])"
  }

  private val shExpr = shExprN(3)

  val textTokens: String = toksCte + """
SELECT doc_id,
       CAST(len(t) AS INTEGER) AS "NTokens",
       CAST(len(list_distinct(t)) AS INTEGER) AS "NDistinct",
       CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS "SumTokenLen",
       CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / CAST(len(t) AS INTEGER) AS "AvgTokenLen"
FROM toks ORDER BY doc_id
"""

  val textQuality: String = toksCte + s"""
, q AS (
  SELECT doc_id,
         CAST(length(text) AS INTEGER) AS "NChars",
         CAST(len(t) AS INTEGER) AS "NTokens",
         CAST(len(list_filter(t, x -> x IN (${sqlList(TextOps.stopwords)}))) AS INTEGER) AS "StopCount",
         CAST(list_max(list_transform(t, x -> length(x))) AS INTEGER) AS "MaxTokenLen"
  FROM toks
)
SELECT *, CAST("StopCount" AS DOUBLE) / "NTokens" AS "StopRatio",
       ${qualitySql("\"NTokens\"", "\"StopCount\"")} AS "QualityScore"
FROM q ORDER BY doc_id
"""

  val textLangid: String = {
    val counts = TextOps.langMarkers.map { case (lang, ws) =>
      s"""CAST(len(list_filter(t, x -> x IN (${sqlList(ws)}))) AS INTEGER) AS "C${lang.capitalize}""""
    }.mkString(",\n         ")
    toksCte + s"""
, c AS (
  SELECT doc_id, lang,
         $counts
  FROM toks
)
SELECT doc_id, "CEn", "CEs", "CDe", "CFr",
       ${langArgmaxSql("\"CEn\"", "\"CEs\"", "\"CDe\"", "\"CFr\"")} AS "Predicted",
       lang AS "ActualLang",
       (${langArgmaxSql("\"CEn\"", "\"CEs\"", "\"CDe\"", "\"CFr\"")}) = lang AS "IsMatch"
FROM c ORDER BY doc_id
"""
  }

  /** BPE-vocabulary mirror: the merge loop UNROLLED to
    * [[graft.ops.TextOps.BpeMerges]] CTE triples (pair counts → best
    * pair → applied dictionary), the kmeans-rounds pattern. The
    * tab-TERMINATED segmentation representation is shared verbatim
    * with the engine, so both sides' single `replace()` per step is
    * the same left-to-right non-overlapping symbol-level merge; pair
    * extraction drops the trailing empty split cell with the same
    * non-empty filter; ties and sums follow the house rules
    * (PairCount desc + lexicographic; CAST BIGINT up front per the
    * HUGEINT rule). An exhausted corpus empties b_m and thereafter
    * every d_m — the same early-stop shape as the engine's loop. */
  val textBpeVocab: String =
    bpeCtes(graft.ops.TextOps.BpeMerges) + s"""
SELECT * FROM (
${bpeMergeUnion(graft.ops.TextOps.BpeMerges)}
) ORDER BY "Step"
"""

  /** The driver-loop trainer's mirror is the SAME unrolled chain at
    * [[graft.ops.TextOps.BpeDeepMerges]] steps — one oracle definition
    * covering both execution shapes, which is the equivalence claim
    * made checkable. */
  val textBpeVocabDeep: String =
    bpeCtes(graft.ops.TextOps.BpeDeepMerges) + s"""
SELECT * FROM (
${bpeMergeUnion(graft.ops.TextOps.BpeDeepMerges)}
) ORDER BY "Step"
"""

  /** Encode mirror: corpus tokens joined to the final dictionary
    * d{BpeMerges} (tokenize-by-lookup, same shape as the engine), the
    * same non-empty split-cell filter for symbol counts, zero-fill
    * left join, IEEE double fertility. */
  val textBpeEncode: String = {
    val n = graft.ops.TextOps.BpeMerges
    bpeCtes(n) + s""",
tw AS (SELECT doc_id, unnest(t) AS W FROM toks),
enc AS (
  SELECT tw.doc_id,
         CAST(count(*) AS BIGINT) AS NWords,
         CAST(sum(len([x for x in string_split(d.Seg, chr(9)) if x <> ''])) AS BIGINT) AS NSubwords
  FROM tw JOIN d$n d ON tw.W = d.W
  WHERE length(tw.W) >= 1
  GROUP BY tw.doc_id
)
SELECT t.doc_id,
       COALESCE(enc.NWords, 0) AS "NWords",
       COALESCE(enc.NSubwords, 0) AS "NSubwords",
       CASE WHEN COALESCE(enc.NWords, 0) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(enc.NSubwords AS DOUBLE) / enc.NWords END AS "Fertility"
FROM toks t LEFT JOIN enc ON t.doc_id = enc.doc_id
ORDER BY t.doc_id
"""
  }

  private def bpeMergeUnion(n: Int): String =
    (1 to n).map { m =>
      s"""SELECT CAST($m AS INTEGER) AS "Step", A AS "A", B AS "B", A || B AS "Merged", PairCount AS "PairCount" FROM b$m"""
    }.mkString("\nUNION ALL ")

  private def bpeCtes(n: Int): String = {
    // every step CTE is MATERIALIZED: inlined, each d_m would expand
    // its two references to d_{m-1} recursively — 2^BpeMerges parquet
    // scans (observed as a file-handle explosion, not just slowness)
    val steps = (1 to n).map { m =>
      s"""
p$m AS MATERIALIZED (
  SELECT pr.a AS A, pr.b AS B, CAST(sum(Cnt) AS BIGINT) AS PairCount FROM (
    SELECT Cnt, unnest([{'a': Syms[i], 'b': Syms[i+1]} for i in range(1, len(Syms))]) AS pr
    FROM (SELECT Cnt, [x for x in string_split(Seg, chr(9)) if x <> ''] AS Syms FROM d${m - 1})
  ) GROUP BY 1, 2
),
b$m AS MATERIALIZED (SELECT A, B, PairCount FROM p$m ORDER BY PairCount DESC, A, B LIMIT 1),
d$m AS MATERIALIZED (
  SELECT d.W, d.Cnt,
         replace(d.Seg, b.A || chr(9) || b.B || chr(9), b.A || b.B || chr(9)) AS Seg
  FROM d${m - 1} d, b$m b
)"""
    }.mkString(",")
    toksCte + s""",
w AS (SELECT unnest(t) AS W FROM toks),
d0 AS MATERIALIZED (
  SELECT W, CAST(count(*) AS BIGINT) AS Cnt,
         regexp_replace(W, '(.)', '\\1' || chr(9), 'g') AS Seg
  FROM w WHERE length(W) >= 1 GROUP BY W
),""" + steps
  }

  /** Novelty mirror: the dedup family's distinct trigram shingles,
    * first-seen owner = min doc_id, per-doc novel fraction with the
    * zero-fill left join. */
  val textNovelty: String = toksCte + s""",
shl AS (SELECT doc_id, unnest($shExpr) AS sh FROM toks),
fs AS (SELECT sh, min(doc_id) AS firstdoc FROM shl GROUP BY sh),
agg AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS nsh,
         CAST(sum(CASE WHEN f.firstdoc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS nnovel
  FROM shl s JOIN fs f ON s.sh = f.sh
  GROUP BY s.doc_id
)
SELECT t.doc_id,
       COALESCE(agg.nsh, 0) AS "NShingles",
       COALESCE(agg.nnovel, 0) AS "NNovel",
       CASE WHEN COALESCE(agg.nsh, 0) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(agg.nnovel AS DOUBLE) / agg.nsh END AS "NoveltyFrac"
FROM toks t LEFT JOIN agg ON t.doc_id = agg.doc_id
ORDER BY t.doc_id
"""

  /** Trained-langid mirror: identical trigram extraction (1-based
    * substr over ≥3-char tokens, WITH multiplicity), identical Laplace
    * integer-surprisal bits (`length(bin((T+V) // (c+1))) - 1` — the
    * perplexity house trick, all-integer), identical argmin with
    * lexicographic tie-break; sums CAST BIGINT up front per the
    * HUGEINT rule. */
  val textLangidTrained: String = toksCte + s""",
tokx AS (
  SELECT doc_id, lang, unnest(list_filter(t, x -> length(x) >= 3)) AS tok
  FROM toks
),
trix AS (
  SELECT doc_id, lang,
         unnest([substr(tok, i, 3) for i in generate_series(1, length(tok) - 2)]) AS tri
  FROM tokx
),
dtri AS (
  SELECT doc_id, lang, tri, CAST(count(*) AS BIGINT) AS m
  FROM trix GROUP BY doc_id, lang, tri
),
lc AS (SELECT lang, tri, CAST(sum(m) AS BIGINT) AS c FROM dtri GROUP BY lang, tri),
tt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM lc GROUP BY lang),
vv AS (SELECT CAST(count(DISTINCT tri) AS BIGINT) AS v FROM lc),
grid AS (
  SELECT tt.lang, d.tri,
         CAST(length(bin((tt.t + vv.v) // (COALESCE(lc.c, 0) + 1))) - 1 AS INTEGER) AS bits
  FROM (SELECT DISTINCT tri FROM lc) d CROSS JOIN tt CROSS JOIN vv
  LEFT JOIN lc ON lc.lang = tt.lang AND lc.tri = d.tri
),
sc AS (
  SELECT dt.doc_id, g.lang AS plang, CAST(sum(dt.m * g.bits) AS BIGINT) AS totalbits
  FROM dtri dt JOIN grid g ON dt.tri = g.tri
  GROUP BY dt.doc_id, g.lang
),
bse AS (
  SELECT d.doc_id, d.lang, l.lang AS plang
  FROM documents d CROSS JOIN (SELECT lang FROM tt) l
),
fl AS (
  SELECT b.doc_id, b.lang, b.plang, COALESCE(sc.totalbits, 0) AS totalbits
  FROM bse b LEFT JOIN sc ON b.doc_id = sc.doc_id AND b.plang = sc.plang
),
pick AS (
  SELECT doc_id, lang, plang, totalbits,
         row_number() OVER (PARTITION BY doc_id ORDER BY totalbits, plang) AS rn
  FROM fl
)
SELECT doc_id, lang AS "ActualLang", plang AS "Predicted",
       totalbits AS "PredictedBits", (plang = lang) AS "IsMatch"
FROM pick WHERE rn = 1 ORDER BY doc_id
"""

  val textFingerprint: String = toksCte + s"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS "Fingerprint",
       list_min(list_transform(t, x -> md5(x))) AS "MinTokenHash",
       CAST(len($shExpr) AS INTEGER) AS "NShingles"
FROM toks ORDER BY doc_id
"""

  // ---------- dedup ----------

  val dedupExact: String = toksCte + """
, fp AS (
  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS "Fingerprint"
  FROM toks
)
SELECT doc_id, "Fingerprint",
       min(doc_id) OVER (PARTITION BY "Fingerprint") AS "CanonicalId",
       doc_id <> min(doc_id) OVER (PARTITION BY "Fingerprint") AS "IsDup"
FROM fp ORDER BY doc_id
"""

  private val mhExprs: String = (1 to 8).map { j =>
    s"list_min(list_transform(s, x -> md5('$j|' || x))) AS mh$j"
  }.mkString(",\n         ")

  private val bandsCte: String = toksCte + s"""
, sh AS (SELECT doc_id, $shExpr AS s FROM toks),
mh AS (
  SELECT doc_id, s,
         $mhExprs
  FROM sh
),
bands AS (
  SELECT doc_id, s,
         md5(mh1 || mh2) AS b1, md5(mh3 || mh4) AS b2,
         md5(mh5 || mh6) AS b3, md5(mh7 || mh8) AS b4
  FROM mh
)"""

  val dedupMinhashBands: String = bandsCte + """
SELECT doc_id, b1 AS "B1", b2 AS "B2", b3 AS "B3", b4 AS "B4"
FROM bands ORDER BY doc_id
"""

  /** The (doc_id, band_id, band_val) listing — ONE definition for the
    * self-join candidates and the incremental mirror. */
  private val blCte: String = bandsCte + """
, bl AS (
  SELECT doc_id, 1 AS band_id, b1 AS band_val FROM bands
  UNION ALL SELECT doc_id, 2, b2 FROM bands
  UNION ALL SELECT doc_id, 3, b3 FROM bands
  UNION ALL SELECT doc_id, 4, b4 FROM bands
)"""

  /** ONE builder for the occupancy-cap CTE pair (mirrors the single
    * Scala implementation DedupOps.coolBands serves both domains
    * with): `<out>occ` keeps band keys at-or-below `cap`, `<out>` is
    * `src` restricted to them. A tuning change to either cap constant
    * flows through every mirror from here. */
  private def coolCtes(src: String, out: String, idCol: String, cap: Int): String = s"""
${out}occ AS (
  SELECT band_id, band_val FROM $src
  GROUP BY band_id, band_val
  HAVING count(*) <= $cap
),
$out AS (
  SELECT $src.$idCol, $src.band_id, $src.band_val
  FROM $src JOIN ${out}occ USING (band_id, band_val)
)"""

  /** blCte + the LSH candidate pairs (band agreement, d1 < d2), with
    * the hot-bucket cap mirrored from DedupOps.HotBandMaxOccupancy —
    * the cap is part of the query definition, shared constant and
    * all. */
  private val candCte: String = blCte + "," +
    coolCtes("bl", "cool", "doc_id", graft.ops.DedupOps.HotBandMaxOccupancy) + """,
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM cool a JOIN cool b ON a.band_id = b.band_id AND a.band_val = b.band_val
                          AND a.doc_id < b.doc_id
)"""

  val dedupNeardupPairs: String = candCte + """
, j AS (
  SELECT c.d1 AS "D1", c.d2 AS "D2",
         CAST(len(list_intersect(sa.s, sb.s)) AS INTEGER) AS "NInter",
         CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS INTEGER) AS "NUnion"
  FROM cand c JOIN sh sa ON c.d1 = sa.doc_id JOIN sh sb ON c.d2 = sb.doc_id
)
SELECT "D1", "D2", "NInter", "NUnion",
       CAST("NInter" AS DOUBLE) / "NUnion" AS "Jaccard"
FROM j WHERE CAST("NInter" AS DOUBLE) / "NUnion" >= 0.5
ORDER BY "D1", "D2"
"""

  /** Edit-distance verify mirror: same candidate CTE, DuckDB's own
    * `levenshtein` (an independent DP implementation) instead of the
    * Spark expression; threshold interpolated from the shared
    * constant. Parity scope: ASCII text (the testdata corpus) —
    * DuckDB's `levenshtein` is not codepoint-identical to Spark's on
    * multi-byte/astral input; see COVERAGE.md's edit-distance row. */
  val dedupEditDistance: String = candCte + s"""
, t AS (SELECT doc_id, text FROM documents),
jd AS (
  SELECT c.d1 AS "D1", c.d2 AS "D2",
         CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS "EditDist",
         greatest(length(ta.text), length(tb.text)) AS ml
  FROM cand c JOIN t ta ON c.d1 = ta.doc_id JOIN t tb ON c.d2 = tb.doc_id
)
SELECT "D1", "D2", "EditDist",
       1.0 - CAST("EditDist" AS DOUBLE) / ml AS "EditSim"
FROM jd
WHERE 1.0 - CAST("EditDist" AS DOUBLE) / ml >= ${graft.ops.DedupOps.EditSimThreshold}
ORDER BY "D1", "D2"
"""

  /** Exact-Jaccard-join mirror: deliberately BRUTE FORCE — the full
    * quadratic pair join with NO blocking of any kind. The engine
    * answers with a prefix-filtered join (DedupOps.jaccardExact);
    * hash equality against this mirror is the executable proof that
    * prefix filtering is lossless (zero false negatives), which is
    * exactly the property that separates it from the LSH path. */
  val dedupJaccardExact: String = toksCte + s"""
, sh2 AS (SELECT doc_id, $shExpr AS s FROM toks),
shn AS (SELECT doc_id, s FROM sh2 WHERE len(s) > 0),
j AS (
  SELECT a.doc_id AS "D1", b.doc_id AS "D2",
         CAST(len(list_intersect(a.s, b.s)) AS INTEGER) AS "NInter",
         CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS INTEGER) AS "NUnion"
  FROM shn a JOIN shn b ON a.doc_id < b.doc_id
)
SELECT "D1", "D2", "NInter", "NUnion",
       CAST("NInter" AS DOUBLE) / "NUnion" AS "Jaccard"
FROM j WHERE CAST("NInter" AS DOUBLE) / "NUnion" >= ${graft.ops.DedupOps.JaccardThreshold}
ORDER BY "D1", "D2"
"""

  /** Containment mirror: brute-force ordered self-join (the engine's
    * prefix filter is LOSSLESS, so the full quadratic comparison must
    * agree pair-for-pair), identical integer cross-multiplied
    * threshold, one division. */
  val dedupContainment: String = {
    import graft.ops.DedupOps.{ContainNum, ContainDen}
    toksCte + s"""
, sh2 AS (SELECT doc_id, $shExpr AS s FROM toks),
shn AS (SELECT doc_id, s FROM sh2 WHERE len(s) > 0),
j AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib,
         CAST(len(a.s) AS INTEGER) AS na,
         CAST(len(list_intersect(a.s, b.s)) AS INTEGER) AS ni
  FROM shn a JOIN shn b ON a.doc_id <> b.doc_id
)
SELECT ia AS "InnerId", ib AS "OuterId", na AS "NShingles", ni AS "NInter",
       CAST(ni AS DOUBLE) / na AS "Containment"
FROM j WHERE ni * $ContainDen >= na * $ContainNum
ORDER BY "InnerId", "OuterId"
"""
  }

  /** Dedup-report mirror: the three kernels' short mirror forms
    * (fingerprint groups; brute-force Jaccard ≥ ½ — the engine's
    * prefix filter is lossless; ordered containment ≥ ⅘) reduced to
    * the same counts and single-division rates. */
  val dedupReport: String = {
    import graft.ops.DedupOps.{ContainNum, ContainDen}
    toksCte + s"""
, fp AS (SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS f
  FROM toks),
exd AS (SELECT count(*) AS np, count(*) AS na
        FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS c FROM fp) x
        WHERE doc_id <> c),
sh2 AS (SELECT doc_id, $shExpr AS s FROM toks),
shn AS (SELECT doc_id, s FROM sh2 WHERE len(s) > 0),
jp AS (SELECT a.doc_id AS d1, b.doc_id AS d2
       FROM shn a JOIN shn b ON a.doc_id < b.doc_id
       WHERE len(list_intersect(a.s, b.s)) * 2 >=
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
jn AS (SELECT count(*) AS np, count(DISTINCT d2) AS na FROM jp),
cp AS (SELECT a.doc_id AS ia
       FROM shn a JOIN shn b ON a.doc_id <> b.doc_id
       WHERE len(list_intersect(a.s, b.s)) * $ContainDen >= len(a.s) * $ContainNum),
cn AS (SELECT count(*) AS np, count(DISTINCT ia) AS na FROM cp),
nn AS (SELECT count(*) AS n FROM documents),
u AS (
  SELECT 'containment' AS m, np, na FROM cn
  UNION ALL SELECT 'exact', np, na FROM exd
  UNION ALL SELECT 'jaccard', np, na FROM jn
)
SELECT u.m AS "Method", CAST(u.np AS BIGINT) AS "NLinks",
       CAST(u.na AS BIGINT) AS "NAffected", CAST(nn.n AS BIGINT) AS "NDocs",
       CAST(u.na AS DOUBLE) / nn.n AS "RemovalRate"
FROM u CROSS JOIN nn
ORDER BY "Method"
"""
  }

  /** Audio-fingerprint mirror: identical 256-byte proxy samples,
    * identical 4-sample frame energies (widened to BIGINT on both
    * sides — the engine kernel accumulates in long so CJK-range
    * codepoints can't overflow; the mirror widens identically), the
    * same energy-delta bits, band layout, hot-bucket cap, Hamming +
    * IsClose verdict. */
  val multimodalAudioFingerprint: String = {
    val mm = graft.ops.MultimodalOps
    s"""
WITH smp AS (
  SELECT doc_id,
         [ascii(substr(text, (i * length(text)) // 256 + 1, 1))
          for i in generate_series(0, 255)] AS s
  FROM documents
),
en AS (
  SELECT doc_id,
         [list_sum([CAST(s[4 * f + j + 1] AS BIGINT) * s[4 * f + j + 1]
                    for j in generate_series(0, 3)])
          for f in generate_series(0, 63)] AS e
  FROM smp
),
bands AS (
  SELECT doc_id,
         [list_sum([CASE WHEN ${mm.AhashBandBits} * b + j + 1 <= 63
                          AND e[${mm.AhashBandBits} * b + j + 2] >
                              e[${mm.AhashBandBits} * b + j + 1]
                         THEN 1 << j ELSE 0 END
                    for j in generate_series(0, ${mm.AhashBandBits - 1})])
          for b in generate_series(0, ${mm.AhashBands - 1})] AS bv
  FROM en
),
bx AS (SELECT doc_id, unnest(generate_series(0, ${mm.AhashBands - 1})) AS b,
              unnest(bv) AS v
       FROM bands),
cool AS (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, v) AS bs FROM bx)
  WHERE bs <= ${mm.AhashBucketCap}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, c.doc_id AS idb
  FROM cool a JOIN cool c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
),
pairs AS (
  SELECT ida, idb,
         CAST(${(1 to mm.AhashBands)
           .map(i => s"bit_count(xor(CAST(ha.bv[$i] AS BIGINT), CAST(hz.bv[$i] AS BIGINT)))")
           .mkString("\n            + ")}
           AS INTEGER) AS hamming
  FROM cand JOIN bands ha ON ha.doc_id = ida JOIN bands hz ON hz.doc_id = idb
)
SELECT ida AS "IdA", idb AS "IdB", hamming AS "Hamming",
       (hamming <= ${mm.AudioMaxHamming}) AS "IsClose"
FROM pairs
ORDER BY "IdA", "IdB"
"""
  }

  /** Incremental (new-vs-corpus) dedup mirror: same band listing, the
    * join constrained to new × corpus instead of the self-pairing. */
  val dedupIncremental: String = {
    import graft.ops.DedupOps.{NewArrivalMod, NewArrivalRemainder}
    blCte + s"""
, corp AS (
  SELECT * FROM bl WHERE doc_id % $NewArrivalMod <> $NewArrivalRemainder
),""" +
      coolCtes("corp", "corpcool", "doc_id", graft.ops.DedupOps.HotBandMaxOccupancy) + s""",
cand AS (
  SELECT DISTINCT a.doc_id AS nid, b.doc_id AS cid
  FROM bl a JOIN corpcool b ON a.band_id = b.band_id AND a.band_val = b.band_val
  WHERE a.doc_id % $NewArrivalMod = $NewArrivalRemainder
),
j AS (
  SELECT c.nid, c.cid,
         CAST(len(list_intersect(sa.s, sb.s)) AS INTEGER) AS ni,
         CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS INTEGER) AS nu
  FROM cand c JOIN sh sa ON c.nid = sa.doc_id JOIN sh sb ON c.cid = sb.doc_id
)
SELECT nid AS "NewId", cid AS "CorpusId", ni AS "NInter", nu AS "NUnion",
       CAST(ni AS DOUBLE) / nu AS "Jaccard"
FROM j WHERE CAST(ni AS DOUBLE) / nu >= 0.5
ORDER BY nid, cid
"""
  }

  /** Connected components over the verified near-dup pairs: a TRUE
    * transitive closure (recursive CTE), independent of the Spark
    * side's bounded label propagation — under-iteration there would
    * hash-mismatch here. */
  /** Shared prefix: verified pairs → edges → transitive closure →
    * per-doc cluster (min reachable label). Used by the components
    * query and the curation composite. */
  private val componentsCore: String =
    candCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """
, pairs AS (
  SELECT c.d1, c.d2
  FROM cand c JOIN sh sa ON c.d1 = sa.doc_id JOIN sh sb ON c.d2 = sb.doc_id
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL SELECT d2, d1 FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src
),
comp AS (
  SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
)"""

  val dedupComponents: String = componentsCore + """
SELECT doc_id,
       cluster AS "ClusterId",
       (doc_id = cluster) AS "IsSurvivor"
FROM comp ORDER BY doc_id
"""

  /** Quality-aware survivor mirror: the SAME recursive-CTE transitive
    * closure as [[dedupComponents]], survivor = per-cluster argmax by
    * (quality DESC, doc_id ASC) — the row_number transcription of the
    * engine's `min(struct(-score, doc_id))` aggregate (identical
    * ordering: negated-double ascending = score descending). */
  val dedupSurvivorQuality: String = componentsCore + s""",
qv AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS ntok,
         CAST(len(list_filter(t, x -> x IN (${sqlList(TextOps.stopwords)}))) AS INTEGER) AS stopc
  FROM toks
),
qq AS (
  SELECT comp.doc_id, comp.cluster,
         ${qualitySql("ntok", "stopc")} AS qs
  FROM comp JOIN qv ON comp.doc_id = qv.doc_id
),
sv AS (
  SELECT cluster, doc_id AS survivor FROM (
    SELECT cluster, doc_id,
           row_number() OVER (PARTITION BY cluster ORDER BY qs DESC, doc_id) AS rn
    FROM qq
  ) WHERE rn = 1
)
SELECT q.doc_id, CAST(q.cluster AS BIGINT) AS "ClusterId",
       q.qs AS "QualityScore",
       CAST(sv.survivor AS BIGINT) AS "SurvivorId",
       (q.doc_id = sv.survivor) AS "IsSurvivor"
FROM qq q JOIN sv ON q.cluster = sv.cluster
ORDER BY q.doc_id
"""

  val dedupSimhash: String = {
    val bits = (1 to 8).map { p =>
      s"""(CASE WHEN 2 * list_sum(list_transform(dt, x -> instr('0123456789abcdef', substr(md5(x), $p, 1)) - 1))
         |      >= 15 * len(dt) THEN '1' ELSE '0' END)""".stripMargin
    }.mkString(" ||\n  ")
    toksCte + s"""
, dts AS (SELECT doc_id, list_distinct(t) AS dt FROM toks),
sim AS (
  SELECT doc_id,
  $bits AS "Simhash"
  FROM dts
)
SELECT doc_id, "Simhash",
       CAST(count(*) OVER (PARTITION BY "Simhash") AS INTEGER) AS "BucketSize"
FROM sim ORDER BY doc_id
"""
  }

  // ---------- curation ----------

  /** Deterministic split mirror: bucket = first md5 byte, decoded with
    * the same instr-per-hex-digit trick as the LSH planes (DuckDB has
    * no base-16 string conversion). Thresholds from CurateOps. */
  /** Grouped-split mirror: the same first-md5-byte bucket keyed by
    * SOURCE, so the one-split-per-source invariant holds identically
    * both sides. */
  val curateSplitGrouped: String = {
    import graft.ops.CurateOps.{TrainUpper, ValUpper}
    """
WITH b AS (
  SELECT doc_id, source,
         16 * (instr('0123456789abcdef', substr(md5(source), 1, 1)) - 1)
           + (instr('0123456789abcdef', substr(md5(source), 2, 1)) - 1) AS bk
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN bk < """ + TrainUpper + """ THEN 'train'
            WHEN bk < """ + ValUpper + """ THEN 'val'
            ELSE 'test' END AS "Split"
FROM b ORDER BY doc_id
"""
  }

  val curateSplitAssign: String = {
    import graft.ops.CurateOps.{TrainUpper, ValUpper}
    """
WITH b AS (
  SELECT doc_id,
         CAST(16 * (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS INTEGER) AS "Bucket"
  FROM documents
)
SELECT doc_id, "Bucket",
       CASE WHEN "Bucket" < """ + TrainUpper + """ THEN 'train'
            WHEN "Bucket" < """ + ValUpper + """ THEN 'val'
            ELSE 'test' END AS "Split"
FROM b ORDER BY doc_id
"""
  }

  /** Curation composite mirror: dedup survivor (components core) ∧
    * predicted-en ∧ quality ≥ threshold. Score/argmax formulas are the
    * exact textQuality/textLangid expressions, so every IEEE
    * comparison (threshold included) reproduces bit-for-bit. */
  /** DSIR importance-resampling mirror: identical target/rest split,
    * identical Laplace integer-surprisal bits per term on each side
    * (`len(bin((T+V) // (c+1))) - 1` ≡ Spark's `length(bin(...)) - 1`),
    * identical Σ Tf·(br − bt) integer weight, identical
    * (weight desc, doc_id) total order. */
  val curateImportanceResample: String = {
    val tgt = graft.ops.CurateOps.DsirTargetSource
    s"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
ex AS (SELECT k.doc_id, d.source, unnest(k.t) AS tok
       FROM toks k JOIN documents d ON d.doc_id = k.doc_id),
tc AS (SELECT tok,
              CAST(sum(CASE WHEN source = '$tgt' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
              CAST(sum(CASE WHEN source <> '$tgt' THEN 1 ELSE 0 END) AS BIGINT) AS cr
       FROM ex GROUP BY tok),
tt AS (SELECT CAST(sum(ct) AS BIGINT) AS ttot, CAST(sum(cr) AS BIGINT) AS rtot,
              CAST(count(*) AS BIGINT) AS v FROM tc),
bits AS (SELECT tok,
                CAST(len(bin((ttot + v) // (ct + 1))) - 1 AS INTEGER) AS bt,
                CAST(len(bin((rtot + v) // (cr + 1))) - 1 AS INTEGER) AS br
         FROM tc CROSS JOIN tt),
cand AS (SELECT doc_id, source, tok, CAST(count(*) AS INTEGER) AS tf
         FROM ex WHERE source <> '$tgt' GROUP BY 1, 2, 3)
SELECT doc_id, source,
       CAST(sum(tf) AS BIGINT) AS "NTokens",
       CAST(sum(tf * (br - bt)) AS BIGINT) AS "LogRatioBits"
FROM cand JOIN bits ON bits.tok = cand.tok
GROUP BY doc_id, source
ORDER BY "LogRatioBits" DESC, doc_id
LIMIT ${graft.ops.CurateOps.DsirTopK}
"""
  }

  val curateCorpus: String = {
    val en = sqlList(TextOps.langMarkers.toMap.apply("en"))
    val es = sqlList(TextOps.langMarkers.toMap.apply("es"))
    val de = sqlList(TextOps.langMarkers.toMap.apply("de"))
    val fr = sqlList(TextOps.langMarkers.toMap.apply("fr"))
    componentsCore + s"""
, m AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS ntok,
         CAST(len(list_filter(t, x -> x IN (${sqlList(TextOps.stopwords)}))) AS INTEGER) AS stopc,
         len(list_filter(t, x -> x IN ($en))) AS cen,
         len(list_filter(t, x -> x IN ($es))) AS ces,
         len(list_filter(t, x -> x IN ($de))) AS cde,
         len(list_filter(t, x -> x IN ($fr))) AS cfr
  FROM toks
),
sel AS (
  SELECT m.doc_id,
         ntok AS "NTokens",
         ${qualitySql("ntok", "stopc")} AS "QualityScore",
         ${langArgmaxSql("cen", "ces", "cde", "cfr")} AS pred
  FROM m JOIN comp c ON m.doc_id = c.doc_id AND m.doc_id = c.cluster
)
SELECT doc_id, "NTokens", "QualityScore"
FROM sel
WHERE pred = 'en' AND "QualityScore" >= ${graft.ops.CurateOps.MinQuality}
ORDER BY doc_id
"""
  }

  /** Corpus-profiling mirror: floor-quantized quality sum (the
    * engine-unambiguous exact mean), quantile_cont median (same
    * interpolation rule as Spark's exact percentile), share via the
    * grand total over the post-agg rows. */
  val textCorpusStats: String = toksCte + s"""
, sc AS (
  SELECT lang,
         CAST(len(t) AS INTEGER) AS ntok,
         CAST(len(list_filter(t, x -> x IN (${sqlList(TextOps.stopwords)}))) AS INTEGER) AS stopc
  FROM toks
),
q AS (
  SELECT lang, ntok,
         ${qualitySql("ntok", "stopc")} AS qs
  FROM sc
),
g AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS "NDocs",
         CAST(sum(ntok) AS BIGINT) AS "SumTokens",
         CAST(quantile_cont(ntok, 0.5) AS DOUBLE) AS "MedianTokens",
         CAST(sum(CAST(floor(qs * 1e9) AS BIGINT)) AS DOUBLE) / count(*) / 1e9 AS "AvgQuality"
  FROM q GROUP BY lang
)
SELECT lang, "NDocs", "SumTokens", "MedianTokens", "AvgQuality",
       CAST("NDocs" AS DOUBLE) / sum("NDocs") OVER () AS "ShareOfDocs"
FROM g ORDER BY lang
"""

  /** Token-budget packing mirror: identical quality formula
    * (textQuality expressions) and (score desc, doc_id) total order,
    * running token sum capped at the shared budget. */
  val curateTokenBudget: String = toksCte + s"""
, q AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS ntok,
         CAST(len(list_filter(t, x -> x IN (${sqlList(TextOps.stopwords)}))) AS INTEGER) AS stopc
  FROM toks
),
s AS (
  SELECT doc_id, ntok,
         ${qualitySql("ntok", "stopc")} AS qs
  FROM q
),
c AS (
  SELECT doc_id, ntok, qs,
         CAST(sum(ntok) OVER (ORDER BY qs DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM s
)
SELECT doc_id, ntok AS "NTokens", qs AS "QualityScore", cum AS "CumTokens"
FROM c WHERE cum <= ${graft.ops.CurateOps.TokenBudget}
ORDER BY doc_id
"""

  /** Sequence-packing mirror: identical whitespace token count, the
    * same per-source (doc_id-ordered) exclusive prefix sum, and the
    * shared [[graft.ops.CurateOps.PackSeqLen]] chop — all exact
    * integer division, so any layout divergence is a hash miss. */
  val curatePackSequences: String = s"""
WITH toks AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS nt
  FROM documents
),
nz AS (SELECT * FROM toks WHERE nt > 0),
p AS (
  SELECT source, doc_id, nt,
         CAST(coalesce(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
  FROM nz
)
SELECT source, doc_id, nt AS "NTokens", st AS "StartTok",
       st // ${graft.ops.CurateOps.PackSeqLen} AS "FirstSeq",
       (st + nt - 1) // ${graft.ops.CurateOps.PackSeqLen} AS "LastSeq",
       CAST((st + nt - 1) // ${graft.ops.CurateOps.PackSeqLen}
            - st // ${graft.ops.CurateOps.PackSeqLen} + 1 AS INTEGER) AS "NSeqSpan"
FROM p ORDER BY source, doc_id
"""

  /** Weight-proportional sampling mirror: identical 48-bit md5-prefix
    * coin and the INTEGER threshold compare (no float in the decision),
    * so the kept set is bit-identical by construction. */
  lazy val curateSampleWeighted: String = s"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS nt,
         CAST(${hex48("md5(CAST(doc_id AS VARCHAR))")} AS BIGINT) AS h
  FROM documents
)
SELECT doc_id, source, nt AS "NTokens", h AS "Hash48",
       CAST(nt AS DOUBLE) / ${graft.ops.CurateOps.WeightSampleDenom}.0 AS "InclusionP"
FROM t
WHERE h * ${graft.ops.CurateOps.WeightSampleDenom} < CAST(nt AS BIGINT) * 281474976710656
ORDER BY doc_id
"""

  /** Mixture-rebalancing mirror (default uniform weights): per-source
    * token supply, the in-plan feasibility bound T = min(S·W // w),
    * and the EXACT integer keep decision in HUGEINT (the Spark side
    * evaluates the same products in decimal128) — coin salted with
    * CurateOps.MixtureSalt. */
  lazy val curateMixtureBalance: String = s"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nt,
         CAST(${hex48(s"md5('${graft.ops.CurateOps.MixtureSalt}' || CAST(doc_id AS VARCHAR))")} AS BIGINT) AS h
  FROM documents
),
sup AS (SELECT source, sum(nt) AS s, CAST(1 AS BIGINT) AS w FROM t GROUP BY source),
tot AS (SELECT sum(w) AS wtot FROM sup),
tm AS (SELECT min(s * wtot // w) AS tt FROM sup CROSS JOIN tot),
r AS (SELECT source, s, w * tt AS tn, wtot FROM sup CROSS JOIN tot CROSS JOIN tm)
SELECT t.doc_id, t.source, nt AS "NTokens", h AS "Hash48",
       CAST(h AS HUGEINT) * wtot * s < CAST(tn AS HUGEINT) * ${graft.ops.CurateOps.Pow48} AS "IsKept",
       CAST(tn AS DOUBLE) / CAST(wtot * s AS DOUBLE) AS "InclusionP"
FROM t JOIN r ON t.source = r.source
ORDER BY t.doc_id
"""

  /** Salted md5-first-byte bucket of doc_id (mirrors
    * CurateOps.hashBucket; DuckDB lacks base-16 conversion, so decode
    * the two hex digits with the instr trick). */
  private def bucketSql(salt: String): String = {
    def hex(pos: Int) =
      s"(instr('0123456789abcdef', substr(md5('$salt' || CAST(doc_id AS VARCHAR)), $pos, 1)) - 1)"
    s"CAST(16 * ${hex(1)} + ${hex(2)} AS INTEGER)"
  }

  // ---- shared curation/text formula fragments ----
  //
  // ONE definition each for every formula that appears in more than
  // one mirror (stage mirrors + the funnel that recomposes them): a
  // threshold or formula change must flow through every mirror from a
  // single site, or the funnel silently drifts from the stages it
  // claims to recompose.

  /** The `spl(doc_id, split)` CTE — the md5 split every curation
    * mirror filters on. */
  private def splitCteSql: String = {
    import graft.ops.CurateOps.{TrainUpper, ValUpper}
    s"""spl AS (
  SELECT doc_id,
         CASE WHEN ${bucketSql("")} < $TrainUpper THEN 'train'
              WHEN ${bucketSql("")} < $ValUpper THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)"""
  }

  /** Per-language stratified-sampling threshold CASE. */
  private def sampleCaseSql: String = {
    import graft.ops.CurateOps.{SampleDefaultThreshold, SampleThresholds}
    SampleThresholds
      .map { case (lang, t) => s"WHEN lang = '$lang' THEN $t" }
      .mkString("CASE ", " ", s" ELSE $SampleDefaultThreshold END")
  }

  /** The textQuality score formula over token-count / stop-count
    * expressions. */
  private def qualitySql(ntok: String, stopc: String): String =
    s"""least(CAST(1.0 AS DOUBLE), CAST($ntok AS DOUBLE) / 200.0)
           * (CAST(1.0 AS DOUBLE) - CAST($stopc AS DOUBLE) / $ntok)"""

  /** The langid argmax CASE over four marker-count expressions (tie
    * order en > es > de > fr, same as TokenStats). */
  private def langArgmaxSql(cen: String, ces: String, cde: String, cfr: String): String =
    s"""CASE WHEN $cen >= greatest($ces, $cde, $cfr) THEN 'en'
            WHEN $ces >= greatest($cde, $cfr) THEN 'es'
            WHEN $cde >= $cfr THEN 'de'
            ELSE 'fr' END"""

  /** Non-distinct bigram list over the token array `t`. */
  private def bigramsSql: String = "[t[i] || ' ' || t[i+1] for i in range(1, len(t))]"

  /** Per-doc max token multiplicity (needs `toks` in scope); `alias`
    * names the count column. */
  private def topTokenCountSql(alias: String): String = s"""
  SELECT doc_id, CAST(max(c) AS INTEGER) AS $alias
  FROM (SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY doc_id, tok)
  GROUP BY doc_id"""

  /** The repetition-filter predicate over bigram/top-token counts. */
  private def repetitivePredSql(nbg: String, ndbg: String,
                                topc: String, ntok: String): String =
    s"""((CASE WHEN $nbg = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST($nbg - $ndbg AS DOUBLE) / $nbg END) > ${TextOps.MaxDupBigramFrac}
          OR CAST($topc AS DOUBLE) / $ntok > ${TextOps.MaxTopTokenFrac})"""

  /** Decontamination CTE chain `${p}sh/${p}ex/${p}ev/${p}hits` — hits
    * = per-TRAIN-doc distinct contaminating eval docs (`ne`) and
    * shared shingles (`ns`). Requires `toks` and `spl` CTEs in scope;
    * the prefix lets the funnel avoid colliding with componentsCore's
    * `sh`. */
  private def decontamCtes(p: String): String = {
    import graft.ops.CurateOps.DecontaminationShingleN
    s"""${p}sh AS (SELECT doc_id, ${shExprN(DecontaminationShingleN)} AS s FROM toks),
${p}ex AS (
  SELECT h.doc_id, spl.split, unnest(h.s) AS shingle
  FROM ${p}sh h JOIN spl ON h.doc_id = spl.doc_id
),
${p}ev AS (SELECT DISTINCT shingle, doc_id AS eval_id FROM ${p}ex WHERE split = 'test'),
${p}hits AS (
  SELECT t.doc_id,
         CAST(count(DISTINCT ev.eval_id) AS INTEGER) AS ne,
         CAST(count(DISTINCT t.shingle) AS INTEGER) AS ns
  FROM ${p}ex t JOIN ${p}ev ev ON t.shingle = ev.shingle
  WHERE t.split = 'train'
  GROUP BY t.doc_id
)"""
  }

  /** Train/eval n-gram decontamination mirror: same shingles (window
    * = CurateOps.DecontaminationShingleN, the SAME constant the Spark
    * side bakes into its plan), same md5 split, eval = test split,
    * any shared shingle counts. */
  val curateDecontaminate: String = {
    import graft.ops.CurateOps.ContaminationMinShingles
    toksCte + s"""
, $splitCteSql,
${decontamCtes("")}
SELECT s.doc_id,
       coalesce(ne, 0) AS "NEvalDocs",
       coalesce(ns, 0) AS "NSharedShingles",
       coalesce(ns, 0) >= $ContaminationMinShingles AS "IsContaminated"
FROM spl s LEFT JOIN hits h ON s.doc_id = h.doc_id
WHERE s.split = 'train'
ORDER BY s.doc_id
"""
  }

  /** Vocabulary-growth mirror: same exact quantile_disc decile
    * thresholds over the ingestion key (the A8 parity), same
    * first-document vocab attribution, same 10-row cumulative frame,
    * one division for the cumulative TTR. */
  val textVocabGrowth: String = {
    import graft.ops.TextOps.VocabGrowthSteps
    val n = VocabGrowthSteps
    val thCols = (1 to n)
      .map(d => s"quantile_disc(doc_id, ${d.toDouble / n}) AS t$d").mkString(", ")
    def caseOf(c: String) =
      (1 to n).map(d => s"WHEN $c <= th.t$d THEN $d")
        .mkString("CASE ", " ", s" ELSE $n END")
    toksCte + s""",
th AS (SELECT $thCols FROM documents),
ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
dd AS (SELECT ${caseOf("d.doc_id")} AS dec FROM documents d CROSS JOIN th),
dc AS (SELECT dec, count(*) AS nd FROM dd GROUP BY dec),
te AS (SELECT ${caseOf("e.doc_id")} AS dec FROM ex e CROSS JOIN th),
tc AS (SELECT dec, count(*) AS nt FROM te GROUP BY dec),
fd AS (SELECT tok, min(doc_id) AS fdoc FROM ex GROUP BY tok),
fv AS (SELECT ${caseOf("fd.fdoc")} AS dec, count(*) AS nv
       FROM fd CROSS JOIN th GROUP BY 1),
g AS (SELECT r.range AS dec, coalesce(dc.nd, 0) AS nd,
             coalesce(tc.nt, 0) AS nt, coalesce(fv.nv, 0) AS nv
      FROM range(1, ${n + 1}) r
      LEFT JOIN dc ON dc.dec = r.range
      LEFT JOIN tc ON tc.dec = r.range
      LEFT JOIN fv ON fv.dec = r.range),
c AS (SELECT dec,
        sum(nd) OVER w AS cnd, sum(nt) OVER w AS cnt2, sum(nv) OVER w AS cnv
      FROM g WINDOW w AS (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT CAST(dec AS INTEGER) AS "Decile",
       CAST(cnd AS BIGINT) AS "NDocsCum",
       CAST(cnt2 AS BIGINT) AS "NTokensCum",
       CAST(cnv AS BIGINT) AS "VocabCum",
       CASE WHEN cnt2 > 0 THEN CAST(cnv AS DOUBLE) / cnt2 END AS "TtrCum"
FROM c ORDER BY "Decile"
"""
  }

  /** Split-leakage mirror: same wide-window shingles, same md5 split,
    * per-split distinct vocabularies joined on the shingle key (the
    * RAW string — the engine side joins xxhash64 keys, so the hash
    * match doubles as a collision-freedom certificate at gate scale),
    * the same ≥ ContaminationMinShingles per-(pair, doc) cut, one
    * division per pair row. Parameterized by the split CTE: the
    * per-doc card and the grouped-scheme audit share one body, as the
    * engine side does. */
  private def splitLeakageSqlWith(splitCte: String): String = {
    import graft.ops.CurateOps.{ContaminationMinShingles, DecontaminationShingleN}
    toksCte + s"""
, $splitCte,
sh AS (SELECT doc_id, ${shExprN(DecontaminationShingleN)} AS s FROM toks),
ex AS (
  SELECT h.doc_id, spl.split, unnest(h.s) AS shingle
  FROM sh h JOIN spl ON h.doc_id = spl.doc_id
),
voc AS (SELECT DISTINCT split AS osplit, shingle FROM ex),
lk AS (
  -- count(*) ≡ count(DISTINCT shingle): per-doc shingles are
  -- list_distinct and voc is distinct per split (same proof as the
  -- engine side)
  SELECT split, osplit, doc_id FROM (
    SELECT t.split, v.osplit, t.doc_id, count(*) AS nsh
    FROM ex t JOIN voc v ON t.shingle = v.shingle AND t.split <> v.osplit
    GROUP BY t.split, v.osplit, t.doc_id
  ) WHERE nsh >= $ContaminationMinShingles
),
lc AS (SELECT split, osplit, count(*) AS nl FROM lk GROUP BY split, osplit),
tot AS (SELECT split, count(*) AS nd FROM spl GROUP BY split),
pairs AS (SELECT a.split, b.split AS osplit, a.nd
          FROM tot a JOIN tot b ON a.split <> b.split)
SELECT p.split AS "Split", p.osplit AS "OtherSplit",
       CAST(p.nd AS BIGINT) AS "NDocs",
       CAST(coalesce(lc.nl, 0) AS BIGINT) AS "NLeakedDocs",
       CAST(coalesce(lc.nl, 0) AS DOUBLE) / p.nd AS "LeakRate"
FROM pairs p LEFT JOIN lc ON p.split = lc.split AND p.osplit = lc.osplit
ORDER BY "Split", "OtherSplit"
"""
  }

  val curateSplitLeakage: String = splitLeakageSqlWith(splitCteSql)

  /** The grouped-scheme audit: same body over the SOURCE-keyed split
    * (curateSplitGrouped's bucket), the pair card splitGrouped exists
    * to be judged by. */
  val curateSplitLeakageGrouped: String =
    splitLeakageSqlWith(groupSplitCteSql)

  /** The `spl(doc_id, split)` CTE keyed by SOURCE — the grouped
    * scheme's split, one definition with [[splitCteSql]]'s thresholds. */
  private def groupSplitCteSql: String = {
    import graft.ops.CurateOps.{TrainUpper, ValUpper}
    def hex(pos: Int) =
      s"(instr('0123456789abcdef', substr(md5(source), $pos, 1)) - 1)"
    s"""spl AS (
  SELECT doc_id,
         CASE WHEN 16 * ${hex(1)} + ${hex(2)} < $TrainUpper THEN 'train'
              WHEN 16 * ${hex(1)} + ${hex(2)} < $ValUpper THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)"""
  }

  /** End-to-end curation-pipeline funnel mirror: recomposes EVERY
    * stage mirror (md5 split, wide-window decontamination, salted
    * stratified sample, quality+repetition filter, the recursive
    * components survivor, budget pack) into one counts frame — the
    * oracle must reproduce the composed pipeline's per-stage doc
    * counts exactly, not just each stage in isolation. Constants all
    * interpolate from CurateOps/TextOps, so a threshold change flows
    * through both engines from one definition. */
  val curatePipelineFunnel: String = {
    import graft.ops.CurateOps.{ContaminationMinShingles, MinQuality, TokenBudget}
    componentsCore + s""",
$splitCteSql,
${decontamCtes("d")},
samp AS (
  SELECT doc_id, ${bucketSql("sample|")} < ($sampleCaseSql) AS is_sampled
  FROM documents
),
qual AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS ntok,
         ${qualitySql("len(t)", s"len(list_filter(t, x -> x IN (${sqlList(TextOps.stopwords)})))")} AS qs
  FROM toks
),
rbs AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS ntok,
         CAST(len(bgs) AS INTEGER) AS nbg,
         CAST(len(list_distinct(bgs)) AS INTEGER) AS ndbg
  FROM (SELECT doc_id, t, $bigramsSql AS bgs FROM toks)
),
rep AS (
  SELECT rbs.doc_id,
         ${repetitivePredSql("nbg", "ndbg", "tt.topc", "rbs.ntok")} AS isrep
  FROM rbs JOIN (${topTokenCountSql("topc")}
  ) tt ON rbs.doc_id = tt.doc_id
),
flags AS (
  SELECT s.doc_id,
         coalesce(h.ns, 0) < $ContaminationMinShingles AS keep_clean,
         b.is_sampled,
         (q.qs >= $MinQuality AND NOT r.isrep) AS keep_quality,
         (c.doc_id = c.cluster) AS is_survivor,
         q.ntok, q.qs
  FROM spl s
  LEFT JOIN dhits h ON s.doc_id = h.doc_id
  JOIN samp b ON s.doc_id = b.doc_id
  JOIN qual q ON s.doc_id = q.doc_id
  JOIN rep r ON s.doc_id = r.doc_id
  JOIN comp c ON s.doc_id = c.doc_id
  WHERE s.split = 'train'
),
pk AS (
  SELECT count(*) AS packed FROM (
    SELECT sum(ntok) OVER (ORDER BY qs DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
    FROM flags WHERE keep_clean AND is_sampled AND keep_quality AND is_survivor
  ) WHERE cum <= $TokenBudget
),
cnt AS (
  SELECT (SELECT count(*) FROM documents) AS total,
         count(*) AS train,
         count(*) FILTER (WHERE keep_clean) AS clean,
         count(*) FILTER (WHERE keep_clean AND is_sampled) AS sampled,
         count(*) FILTER (WHERE keep_clean AND is_sampled AND keep_quality) AS qualn,
         count(*) FILTER (WHERE keep_clean AND is_sampled AND keep_quality AND is_survivor) AS surv,
         (SELECT packed FROM pk) AS packed
  FROM flags
)
SELECT CAST(sn AS INTEGER) AS "StageNo", st AS "Stage",
       CAST(di AS BIGINT) AS "DocsIn", CAST(dout AS BIGINT) AS "DocsOut"
FROM (
  SELECT 1 AS sn, 'train_split' AS st, total AS di, train AS dout FROM cnt
  UNION ALL SELECT 2, 'decontaminate', train, clean FROM cnt
  UNION ALL SELECT 3, 'stratified_sample', clean, sampled FROM cnt
  UNION ALL SELECT 4, 'quality_filter', sampled, qualn FROM cnt
  UNION ALL SELECT 5, 'dedup_survivors', qualn, surv FROM cnt
  UNION ALL SELECT 6, 'budget_pack', surv, packed FROM cnt
) ORDER BY "StageNo"
"""
  }

  /** Stratified-sampling mirror: salted bucket + the per-language
    * threshold CASE built from the same SampleThresholds constants. */
  val curateSampleStratified: String = s"""
WITH b AS (
  SELECT doc_id, lang, ${bucketSql("sample|")} AS "SampleBucket"
  FROM documents
)
SELECT doc_id, lang, "SampleBucket",
       "SampleBucket" < ($sampleCaseSql) AS "IsSampled"
FROM b ORDER BY doc_id
"""

  /** Repetition-filter mirror: non-distinct bigram list comprehension
    * + unnest/group max token count; thresholds from TextOps. */
  val textRepetition: String = toksCte + s"""
, bs AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS "NTokens",
         CAST(len(bgs) AS INTEGER) AS "NBigrams",
         CAST(len(list_distinct(bgs)) AS INTEGER) AS "NDistinctBigrams"
  FROM (SELECT doc_id, t, $bigramsSql AS bgs FROM toks)
),
tt AS (${topTokenCountSql("\"TopTokenCount\"")}
),
f AS (
  SELECT bs.doc_id, "NTokens", "NBigrams", "NDistinctBigrams", "TopTokenCount",
         CASE WHEN "NBigrams" = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST("NBigrams" - "NDistinctBigrams" AS DOUBLE) / "NBigrams" END AS "DupBigramFrac",
         CAST("TopTokenCount" AS DOUBLE) / "NTokens" AS "TopTokenFrac"
  FROM bs JOIN tt ON bs.doc_id = tt.doc_id
)
SELECT *,
       ${repetitivePredSql("\"NBigrams\"", "\"NDistinctBigrams\"", "\"TopTokenCount\"", "\"NTokens\"")} AS "IsRepetitive"
FROM f ORDER BY doc_id
"""

  /** TF-IDF mirror: tf per (doc, token), df per token, rational
    * `tf·N/df` score (log-free — bit-exact in any IEEE engine),
    * row_number top-k with the same (score desc, token asc) order. */
  val textTfidf: String = toksCte + s"""
, ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tf AS (SELECT doc_id, tok, CAST(count(*) AS INTEGER) AS tfc FROM ex GROUP BY doc_id, tok),
dft AS (SELECT tok, CAST(count(*) AS INTEGER) AS dfc FROM tf GROUP BY tok),
nd AS (SELECT CAST(count(*) AS INTEGER) AS ndocs FROM documents),
s AS (
  SELECT tf.doc_id, tf.tok, tfc, dfc,
         CAST(tfc * ndocs AS DOUBLE) / dfc AS score
  FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN nd
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS INTEGER) AS rn
  FROM s
)
SELECT doc_id, tok AS "Token", tfc AS "Tf", dfc AS "Df", score AS "Score", rn AS "Rank"
FROM r WHERE rn <= ${TextOps.TfidfTopK}
ORDER BY doc_id, rn
"""

  /** BM25 mirror: identical query VALUES, rational idf, and the same
    * floor(s·1e9) per-term quantization before the order-free long sum.
    * Every fractional literal is CAST(... AS DOUBLE) — DuckDB parses
    * bare decimal literals as DECIMAL, which would silently switch the
    * arithmetic to exact-decimal division and diverge from Spark's
    * IEEE doubles. */
  /** PMI-collocation mirror: identical adjacent bigrams (t[i], t[i+1]),
    * identical count floor, and the identical exact-integer ratio
    * C(ab)·N²/(C(a)·C(b)·B) widened in HUGEINT (≡ Spark
    * DECIMAL(38,0)) with one correctly-rounded cast to double and one
    * IEEE division — bit-identical PmiRatio, total order on
    * (ratio desc, TermA, TermB). */
  val textPmiCollocations: String = toksCte + s""",
bg AS (
  SELECT unnest([{'a': t[i], 'b': t[i+1]} for i in generate_series(1, len(t)-1)]) AS p
  FROM toks WHERE len(t) >= 2
),
pc AS (SELECT p.a AS ta, p.b AS tb, CAST(count(*) AS BIGINT) AS nboth
       FROM bg GROUP BY 1, 2 HAVING count(*) >= ${TextOps.PmiMinPairCount}),
un AS (SELECT unnest(t) AS tok FROM toks),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM un GROUP BY tok),
tt AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM un),
bt AS (SELECT CAST(sum(len(t) - 1) AS BIGINT) AS nbig FROM toks)
SELECT ta AS "TermA", tb AS "TermB", nboth AS "NBoth",
       ua.c AS "NA", ub.c AS "NB",
       CAST(CAST(nboth AS HUGEINT) * ntok * ntok AS DOUBLE)
         / CAST(CAST(ua.c AS HUGEINT) * ub.c * nbig AS DOUBLE) AS "PmiRatio"
FROM pc JOIN uc ua ON ua.tok = pc.ta JOIN uc ub ON ub.tok = pc.tb
CROSS JOIN tt CROSS JOIN bt
ORDER BY "PmiRatio" DESC, "TermA", "TermB"
LIMIT ${TextOps.PmiTopK}
"""

  val textBm25Topk: String = {
    val terms = TextOps.Bm25Queries.flatMap(_._2.split("\\s+")).distinct.sorted
    val qvals = TextOps.Bm25Queries
      .flatMap { case (qid, q) => q.split("\\s+").distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val k1 = TextOps.Bm25K1
    val b = TextOps.Bm25B
    toksCte + s"""
, ex AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS dl, unnest(t) AS tok FROM toks),
tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS INTEGER) AS tfc
       FROM ex WHERE tok IN (${sqlList(terms)}) GROUP BY doc_id, dl, tok),
dft AS (SELECT tok, CAST(count(*) AS INTEGER) AS dfc FROM tf GROUP BY tok),
st AS (SELECT CAST(count(*) AS INTEGER) AS ndocs,
              CAST(sum(len(t)) AS BIGINT) AS sumdl FROM toks),
q(qid, tok) AS (VALUES $qvals),
s AS (
  SELECT q.qid, tf.doc_id,
         CAST(floor(
           (((ndocs - dfc + CAST(0.5 AS DOUBLE)) / (dfc + CAST(0.5 AS DOUBLE)))
            * (tfc * CAST(${k1 + 1.0} AS DOUBLE))
            / (tfc + CAST($k1 AS DOUBLE)
               * (CAST(${1.0 - b} AS DOUBLE)
                  + CAST($b AS DOUBLE) * dl / (CAST(sumdl AS DOUBLE) / ndocs))))
           * 1e9) AS BIGINT) AS sq
  FROM tf JOIN dft USING (tok) JOIN q ON q.tok = tf.tok CROSS JOIN st
),
g AS (SELECT qid, doc_id, CAST(sum(sq) AS BIGINT) AS scoreq,
             CAST(count(*) AS INTEGER) AS nhit
      FROM s GROUP BY qid, doc_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY scoreq DESC, doc_id ASC) AS INTEGER) AS rn
      FROM g)
SELECT qid AS "QueryId", doc_id, nhit AS "NTermsHit", scoreq AS "ScoreQ",
       CAST(scoreq AS DOUBLE) / 1e9 AS "Score", rn AS "Rank"
FROM r WHERE rn <= ${TextOps.Bm25TopK}
ORDER BY qid, rn
"""
  }

  /** Query-likelihood mirror: identical hit-term filter, identical
    * integer-bit quantizer (`len(bin(x // y)) − 1` — the perplexity
    * pattern), identical per-doc length penalty and (bits desc,
    * doc_id) total order. */
  val retrievalQueryLikelihood: String = {
    val terms = TextOps.Bm25Queries.flatMap(_._2.split("\\s+")).distinct.sorted
    val qvals = TextOps.Bm25Queries
      .flatMap { case (qid, q) => q.split("\\s+").distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val mu = graft.ops.RetrievalOps.QlMu
    toksCte + s"""
, ex AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS dl, unnest(t) AS tok FROM toks),
tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS INTEGER) AS tfc
       FROM ex WHERE tok IN (${sqlList(terms)}) GROUP BY doc_id, dl, tok),
ctf AS (SELECT tok, CAST(sum(tfc) AS BIGINT) AS ctfv FROM tf GROUP BY tok),
st AS (SELECT CAST(sum(len(t)) AS BIGINT) AS sumdl FROM toks),
q(qid, tok) AS (VALUES $qvals),
ql AS (SELECT qid, count(*) AS qlen FROM q GROUP BY qid),
s AS (
  SELECT q.qid, tf.doc_id, tf.dl,
         CAST(len(bin(($mu * ctfv + tfc * sumdl) // ($mu * ctfv))) - 1 AS INTEGER) AS hb
  FROM tf JOIN ctf USING (tok) JOIN q ON q.tok = tf.tok CROSS JOIN st
),
g AS (SELECT qid, doc_id, dl, sum(hb) AS hbs, CAST(count(*) AS INTEGER) AS nhit
      FROM s GROUP BY qid, doc_id, dl),
sc AS (
  SELECT g.qid, g.doc_id, g.nhit,
         CAST(g.hbs - ql.qlen * (len(bin((g.dl + $mu) // $mu)) - 1) AS BIGINT) AS sb
  FROM g JOIN ql ON g.qid = ql.qid
),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY sb DESC, doc_id ASC) AS INTEGER) AS rn
      FROM sc)
SELECT qid AS "QueryId", doc_id, nhit AS "NTermsHit", sb AS "ScoreBits", rn AS "Rank"
FROM r WHERE rn <= ${TextOps.Bm25TopK}
ORDER BY qid, rn
"""
  }

  /** Exact-substring span mirror: identical sliding windows
    * (list_slice(t, i, i+W-1) ≡ Spark's slice(Toks, i, W)), identical
    * md5-of-joined-window hashes, df via the same count-over-hash
    * window on distinct (doc, hash) rows. */
  val dedupSpanWindows: String = {
    val w = graft.ops.DedupOps.SpanWindowTokens
    toksCte + s"""
, win AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= $w THEN
                  [md5(array_to_string(list_slice(t, i, i + ${w - 1}), ' '))
                   for i in generate_series(1, len(t) - ${w - 1})]
                ELSE CAST([] AS VARCHAR[]) END) AS wh
  FROM toks
),
dw AS (SELECT doc_id, wh, CAST(count(*) AS INTEGER) AS pc
       FROM win GROUP BY doc_id, wh),
df AS (SELECT *, CAST(count(*) OVER (PARTITION BY wh) AS INTEGER) AS dfd FROM dw),
d AS (SELECT doc_id,
             CAST(sum(pc) AS BIGINT) AS nw,
             CAST(sum(CASE WHEN dfd >= 2 THEN pc ELSE 0 END) AS BIGINT) AS nd
      FROM df GROUP BY doc_id),
j AS (SELECT docs.doc_id,
             coalesce(nw, 0) AS "NWindows",
             coalesce(nd, 0) AS "NDupWindows"
      FROM (SELECT doc_id FROM documents) docs LEFT JOIN d ON docs.doc_id = d.doc_id)
SELECT doc_id, "NWindows", "NDupWindows",
       CASE WHEN "NWindows" = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST("NDupWindows" AS DOUBLE) / "NWindows" END AS "DupWindowFrac",
       (CASE WHEN "NWindows" = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE CAST("NDupWindows" AS DOUBLE) / "NWindows" END)
         >= ${graft.ops.DedupOps.SpanDupFracFlag} AS "IsFlagged"
FROM j ORDER BY doc_id
"""
  }

  /** Span-excision mirror: identical windows/hashes as
    * [[dedupSpanWindows]], owner = min doc_id per duplicated hash,
    * covered = 16 positions per non-owned duplicated window, rebuild =
    * position-ordered join of the surviving tokens. The double unnest
    * in `tok` is DuckDB's positional zip (Spark's posexplode). */
  val dedupSpanExcise: String = {
    val w = graft.ops.DedupOps.SpanWindowTokens
    toksCte + s""",
wpos AS (
  SELECT doc_id, t,
         unnest(CASE WHEN len(t) >= $w THEN generate_series(1, len(t) - ${w - 1})
                ELSE CAST([] AS BIGINT[]) END) AS i
  FROM toks
),
win AS (
  SELECT doc_id, i,
         md5(array_to_string(list_slice(t, i, i + ${w - 1}), ' ')) AS wh
  FROM wpos
),
own AS (
  SELECT wh, min(doc_id) AS mindoc
  FROM win GROUP BY wh HAVING count(DISTINCT doc_id) >= 2
),
cov0 AS (
  SELECT w.doc_id, unnest(generate_series(w.i, w.i + ${w - 1})) AS pos
  FROM win w JOIN own o ON w.wh = o.wh AND w.doc_id <> o.mindoc
),
cov AS (SELECT DISTINCT doc_id, pos FROM cov0),
tok AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(1, len(t))) AS pos
  FROM toks
),
kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tok tk LEFT JOIN cov c ON tk.doc_id = c.doc_id AND tk.pos = c.pos
  WHERE c.doc_id IS NULL
),
reb AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nkept,
         array_to_string(list(tok ORDER BY pos), ' ') AS cleantext
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS "NTokens",
       COALESCE(reb.nkept, 0) AS "NKept",
       CAST(len(t.t) AS BIGINT) - COALESCE(reb.nkept, 0) AS "NRemoved",
       COALESCE(reb.cleantext, '') AS "CleanText"
FROM toks t LEFT JOIN reb ON t.doc_id = reb.doc_id
ORDER BY t.doc_id
"""
  }

  /** Unigram-surprisal mirror: identical Laplace rarity
    * `(T+V) // (c+1)`, identical `len(bin(r)) - 1` integer log2, and
    * the same long sums — all integer arithmetic, so the only doubles
    * are the two final exactly-rounded divisions. Sums feeding further
    * arithmetic are CAST BIGINT up front (hugeint `bin`/`//` would
    * diverge). */
  val textPerplexity: String = toksCte + s"""
, ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tf AS (SELECT doc_id, tok, CAST(count(*) AS INTEGER) AS tfc FROM ex GROUP BY doc_id, tok),
cnt AS (SELECT tok, CAST(sum(tfc) AS BIGINT) AS c FROM tf GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(c) AS BIGINT) AS t FROM cnt),
cb AS (SELECT tok, c,
              CAST(len(bin((t + v) // (c + 1))) - 1 AS INTEGER) AS bits
       FROM cnt CROSS JOIN tot),
corp AS (SELECT CAST(sum(c * bits) AS BIGINT) AS tb,
                CAST(sum(c) AS BIGINT) AS tt FROM cb),
d AS (SELECT tf.doc_id,
             CAST(sum(tfc) AS BIGINT) AS ntokens,
             CAST(sum(tfc * bits) AS BIGINT) AS sumbits
      FROM tf JOIN cb USING (tok) GROUP BY tf.doc_id)
SELECT doc_id, ntokens AS "NTokens", sumbits AS "SumBits",
       CAST(sumbits AS DOUBLE) / ntokens AS "MeanBits",
       CAST(sumbits AS DOUBLE) / ntokens - CAST(tb AS DOUBLE) / tt AS "DeltaBits",
       abs(CAST(sumbits AS DOUBLE) / ntokens - CAST(tb AS DOUBLE) / tt)
         > CAST(${TextOps.PplBandBits} AS DOUBLE) AS "IsOutlier"
FROM d CROSS JOIN corp ORDER BY doc_id
"""

  /** Bigram-surprisal mirror: identical adjacent pairs, identical
    * conditional Laplace rarity `(C(a)+V) // (C(ab)+1)`, identical
    * `len(bin(r)) - 1` integer log2 and long sums — the only doubles
    * are the two final exactly-rounded divisions, as in the unigram
    * mirror. */
  val textPerplexityBigram: String = toksCte + s"""
, bg AS (
  SELECT doc_id,
         unnest([{'a': t[i], 'b': t[i+1]} for i in generate_series(1, len(t)-1)]) AS p
  FROM toks WHERE len(t) >= 2
),
dtf AS (SELECT doc_id, p.a AS a, p.b AS b, CAST(count(*) AS INTEGER) AS tf2
        FROM bg GROUP BY 1, 2, 3),
pc AS (SELECT a, b, CAST(sum(tf2) AS BIGINT) AS c2 FROM dtf GROUP BY a, b),
un AS (SELECT unnest(t) AS tok FROM toks),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM un GROUP BY tok),
vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uc),
bits AS (SELECT a, b, c2,
                CAST(len(bin((uc.c + v) // (c2 + 1))) - 1 AS INTEGER) AS bits
         FROM pc JOIN uc ON uc.tok = pc.a CROSS JOIN vv),
corp AS (SELECT CAST(sum(c2 * bits) AS BIGINT) AS tb,
                CAST(sum(c2) AS BIGINT) AS tt FROM bits),
d AS (SELECT dtf.doc_id,
             CAST(sum(tf2) AS BIGINT) AS nbigrams,
             CAST(sum(tf2 * bits) AS BIGINT) AS sumbits
      FROM dtf JOIN bits USING (a, b) GROUP BY dtf.doc_id)
SELECT doc_id, nbigrams AS "NBigrams", sumbits AS "SumBits",
       CAST(sumbits AS DOUBLE) / nbigrams AS "MeanBits",
       CAST(sumbits AS DOUBLE) / nbigrams - CAST(tb AS DOUBLE) / tt AS "DeltaBits",
       abs(CAST(sumbits AS DOUBLE) / nbigrams - CAST(tb AS DOUBLE) / tt)
         > CAST(${TextOps.PplBandBits} AS DOUBLE) AS "IsOutlier"
FROM d CROSS JOIN corp ORDER BY doc_id
"""

  /** TextRank mirror: identical symmetrized adjacent-co-occurrence
    * edges and count floor, identical weighted integer-fixed-point
    * rounds (`(rq*w) // sw` on positives ≡ Spark `div`), identical
    * damping rationals — a CTE replay of the same
    * [[graft.ops.GraphOps.PageRankIters]] rounds, so RankQ is
    * bit-identical and (RankQ desc, Token) totally orders. */
  val textTextrankKeywords: String = {
    import graft.ops.GraphOps.{DampDen, DampNum, PageRankIters, RankScale, TeleportQ}
    import graft.ops.TextOps.{TextRankMinW, TextRankTopK}
    val iters = (1 to PageRankIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
  SELECT e.dst AS node,
         CAST($TeleportQ + ($DampNum * CAST(sum((p.rq * e.w) // e.sw) AS BIGINT)) // $DampDen AS BIGINT) AS rq
  FROM e JOIN $prev p ON e.src = p.node
  GROUP BY e.dst)"""
    }.mkString(",\n")
    toksCte + s"""
, bgp AS (
  SELECT unnest([{'a': t[i], 'b': t[i+1]} for i in generate_series(1, len(t)-1)]) AS p
  FROM toks WHERE len(t) >= 2
),
pc AS (SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS c2
       FROM bgp WHERE p.a <> p.b GROUP BY 1, 2),
sym AS (
  SELECT a, b, CAST(sum(c2) AS BIGINT) AS w
  FROM (SELECT a, b, c2 FROM pc UNION ALL SELECT b AS a, a AS b, c2 FROM pc)
  GROUP BY a, b HAVING sum(c2) >= $TextRankMinW
),
sw AS (SELECT a, CAST(sum(w) AS BIGINT) AS sw FROM sym GROUP BY a),
e AS (SELECT sym.a AS src, sym.b AS dst, w, sw FROM sym JOIN sw ON sw.a = sym.a),
r0 AS (SELECT a AS node, CAST($RankScale AS BIGINT) AS rq FROM sw),
$iters
SELECT node AS "Token", sw AS "SumW", rq AS "RankQ"
FROM r$PageRankIters JOIN sw ON sw.a = node
ORDER BY rq DESC, node LIMIT $TextRankTopK
"""
  }

  /** Imputation-report mirror: identical planted nulls, quantile_cont
    * median fill, and the same centi-unit exact before/after sums. */
  val cleanImpute: String = """
WITH p AS (
  SELECT l_returnflag,
         CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_quantity END AS q
  FROM lineitem
),
g AS (
  SELECT l_returnflag,
         count(*) AS nrows,
         count(*) - count(q) AS nnulls,
         quantile_cont(q, 0.5) AS fm,
         CAST(sum(CAST(q * 100 AS BIGINT)) AS BIGINT) AS sb
  FROM p GROUP BY l_returnflag
)
SELECT l_returnflag, nrows AS "NRows", nnulls AS "NNulls",
       fm AS "FillMedian", sb AS "SumQ100Before",
       sb + nnulls * CAST(floor(fm * 100) AS BIGINT) AS "SumQ100After"
FROM g ORDER BY l_returnflag
"""

  /** DQ-suite mirror: the same six rules as anti-join / uniqueness /
    * range counts; rates are the identical NViol/NChecked division;
    * the date contract comes from the shared RelationalOps constants. */
  val dqChecks: String = s"""
WITH
lic AS (SELECT count(*) AS c FROM lineitem),
orc AS (SELECT count(*) AS c FROM orders),
r1 AS (SELECT count(*) AS v FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
r2 AS (SELECT count(*) AS v FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
r3 AS (SELECT coalesce(CAST(sum(cnt - 1) AS BIGINT), 0) AS v FROM (
         SELECT count(*) AS cnt FROM lineitem
         GROUP BY l_orderkey, l_linenumber) WHERE cnt > 1),
r4 AS (SELECT count(*) AS v FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 50),
r5 AS (SELECT count(*) AS v FROM lineitem WHERE l_extendedprice <= 0),
r6 AS (SELECT count(*) AS v FROM orders
       WHERE o_orderdate < DATE '${graft.ops.RelationalOps.DqDateMin}'
          OR o_orderdate >= DATE '${graft.ops.RelationalOps.DqDateMaxExcl}')
SELECT CAST(rn AS INTEGER) AS "RuleNo", rule AS "Rule",
       nc AS "NChecked", nv AS "NViolations",
       CAST(nv AS DOUBLE) / nc AS "ViolationRate"
FROM (
  SELECT 1 AS rn, 'lineitem_orphan_order' AS rule, lic.c AS nc, r1.v AS nv FROM lic, r1
  UNION ALL SELECT 2, 'order_orphan_customer', orc.c, r2.v FROM orc, r2
  UNION ALL SELECT 3, 'lineitem_dup_linenumber', lic.c, r3.v FROM lic, r3
  UNION ALL SELECT 4, 'lineitem_qty_range', lic.c, r4.v FROM lic, r4
  UNION ALL SELECT 5, 'lineitem_price_positive', lic.c, r5.v FROM lic, r5
  UNION ALL SELECT 6, 'order_date_range', orc.c, r6.v FROM orc, r6
) ORDER BY "RuleNo"
"""

  /** Exact-power-sum correlation mirror: identical integer sums (long
    * range), the wide combination in HUGEINT (≡ Spark's
    * DECIMAL(38,0) — both exact int128-class arithmetic), one
    * correctly-rounded cast to double, then IEEE sqrt/divide. The
    * degenerate-group guard is the same exact integer comparison. */
  val statsCorrelation: String = """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY l_returnflag, l_linestatus
),
d AS (
  SELECT *,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
  FROM s
)
SELECT l_returnflag, l_linestatus, n AS "N",
       CAST(sx AS DOUBLE) / n AS "MeanX",
       CAST(sy AS DOUBLE) / n AS "MeanY",
       sqrt(CAST(dx AS DOUBLE)) / n AS "StddevX",
       sqrt(CAST(dy AS DOUBLE)) / n AS "StddevY",
       CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS "CovarPop",
       CASE WHEN dx = 0 OR dy = 0 THEN NULL
            ELSE CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE)))
       END AS "PearsonR"
FROM d ORDER BY l_returnflag, l_linestatus
"""

  /** Market-basket mirror: the same capped basket universe (DuckDB
    * builds pairs with a self-join; Spark runs the single-pass array
    * expansion — identical pair sets), identical exact-integer-count
    * ratios, identical total order for the top-k. */
  val basketPairLift: String = {
    import graft.ops.GraphOps.{BasketTopK, MaxOrderParts}
    s"""
WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
bs AS (SELECT ok FROM lp GROUP BY ok HAVING count(*) <= $MaxOrderParts),
u AS (SELECT lp.ok, lp.part FROM lp JOIN bs ON lp.ok = bs.ok),
tot AS (SELECT count(DISTINCT ok) AS nb FROM u),
pn AS (SELECT part, count(*) AS na FROM u GROUP BY part),
pr AS (SELECT a.part AS pa, b.part AS pb, count(*) AS nboth
       FROM u a JOIN u b ON a.ok = b.ok AND a.part < b.part
       GROUP BY a.part, b.part)
SELECT pa AS "PartA", pb AS "PartB", nboth AS "NOrdersBoth",
       x.na AS "NOrdersA", y.na AS "NOrdersB", tot.nb AS "NBaskets",
       CAST(nboth AS DOUBLE) / tot.nb AS "Support",
       CAST(nboth AS DOUBLE) / x.na AS "Confidence",
       CAST(nboth * tot.nb AS DOUBLE) / (x.na * y.na) AS "Lift"
FROM pr JOIN pn x ON pr.pa = x.part JOIN pn y ON pr.pb = y.part CROSS JOIN tot
ORDER BY nboth DESC, pa, pb
LIMIT $BasketTopK
"""
  }

  /** Integer-PageRank mirror: the same co-purchase edge list (via a
    * plain self-join — DuckDB's optimizer handles it; Spark runs the
    * single-pass array-expansion plan) and the SAME
    * [[graft.ops.GraphOps.PageRankIters]] damped rounds unrolled as
    * chained CTEs. Every constant (scale, damping ratio, teleport,
    * order-size cap) is interpolated from GraphOps, and every step is
    * integer floor-division — bit-identical across engines. Sums are
    * CAST BIGINT before the damping multiply so the arithmetic never
    * enters hugeint. */
  val graphPagerank: String = {
    import graft.ops.GraphOps._
    val iters = (1 to PageRankIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
  SELECT d.src AS node, d.outdeg,
         CAST($TeleportQ + ($DampNum * CAST(sum(p.rq // p.outdeg) AS BIGINT)) // $DampDen AS BIGINT) AS rq
  FROM e JOIN $prev p ON e.src = p.node JOIN deg d ON e.dst = d.src
  GROUP BY d.src, d.outdeg)"""
    }.mkString(",\n")
    s"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT src AS node, outdeg, CAST($RankScale AS BIGINT) AS rq FROM deg),
$iters
SELECT node AS "PartKey", outdeg AS "OutDeg", rq AS "RankQ"
FROM r$PageRankIters ORDER BY node
"""
  }

  /** Drift-card mirror: identical integer bucket counts, identical
    * FIXED-ORDER χ² term chain (t0+t1+…, the EWMA determinism trick)
    * — the sum is an expression, not an aggregate, so the double is
    * bit-identical across engines. */
  val textDriftChisq: String = {
    import graft.ops.TextOps.{DriftBuckets, DriftBucketWidth, DriftChiSqCrit}
    val obs = (0 until DriftBuckets)
      .map(b => s"sum(CASE WHEN bk = $b THEN 1 ELSE 0 END) AS o$b")
      .mkString(",\n         ")
    val sumN = (0 until DriftBuckets).map(b => s"sum(o$b) AS n$b").mkString(", ")
    val terms = (0 until DriftBuckets).map { b =>
      s"CASE WHEN n$b = 0 THEN 0.0 ELSE CAST(o$b * n - ns * n$b AS DOUBLE) * " +
        s"CAST(o$b * n - ns * n$b AS DOUBLE) / " +
        s"(CAST(n AS DOUBLE) * CAST(ns AS DOUBLE) * CAST(n$b AS DOUBLE)) END"
    }.mkString("\n         + ")
    val ocols = (0 until DriftBuckets)
      .map(b => s"""CAST(o$b AS BIGINT) AS "O$b"""").mkString(", ")
    s"""
WITH d AS (
  SELECT source,
         least(len(regexp_split_to_array(trim(text), '\\s+')) // $DriftBucketWidth,
               ${DriftBuckets - 1}) AS bk
  FROM documents
),
s AS (
  SELECT source, count(*) AS ns,
         $obs
  FROM d GROUP BY source
),
t AS (SELECT sum(ns) AS n, $sumN FROM s)
SELECT source, CAST(ns AS BIGINT) AS "NDocs", $ocols,
       ($terms) AS "Chi2",
       ($terms) > $DriftChiSqCrit AS "Drifted"
FROM s CROSS JOIN t
ORDER BY source
"""
  }

  /** Source-entropy mirror: identical per-(source, term) integer
    * counts, identical floor-log2 bits, one division each for the
    * two rates. */
  val textSourceEntropy: String = toksCte + """
, ex AS (SELECT k.doc_id, d.source, unnest(k.t) AS tok
         FROM toks k JOIN documents d ON d.doc_id = k.doc_id),
c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cc
      FROM ex GROUP BY source, tok),
t AS (SELECT source, sum(cc) AS n, count(*) AS nd FROM c GROUP BY source),
b AS (
  SELECT c.source, t.n, t.nd,
         sum(c.cc * (len(bin(t.n // c.cc)) - 1)) AS hq
  FROM c JOIN t ON c.source = t.source
  GROUP BY c.source, t.n, t.nd
)
SELECT source, CAST(n AS BIGINT) AS "NTokens", CAST(nd AS BIGINT) AS "NTypes",
       CAST(hq AS BIGINT) AS "EntropyBitsQ",
       CAST(hq AS DOUBLE) / n AS "MeanBits",
       CAST(nd AS DOUBLE) / n AS "TypeTokenRatio"
FROM b ORDER BY source
"""

  /** KS-drift mirror: identical (source, value) grid, identical
    * running-count CDFs, the same integer sup and the same squared
    * HUGEINT verdict — no sqrt on either side. */
  val textDriftKs: String = {
    import graft.ops.TextOps.{KsCritNum, KsCritDen}
    s"""
WITH d AS (SELECT source, n_chars AS v FROM documents),
c AS (SELECT source, v, count(*) AS cc FROM d GROUP BY source, v),
g AS (SELECT gv.v, gs.source
      FROM (SELECT DISTINCT v FROM d) gv CROSS JOIN (SELECT DISTINCT source FROM d) gs),
sz AS (SELECT source, count(*) AS ns FROM d GROUP BY source),
tt AS (SELECT count(*) AS n FROM d),
tv AS (SELECT v, sum(cc) AS tvv FROM c GROUP BY v),
ct AS (SELECT v, sum(tvv) OVER (ORDER BY v
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctv FROM tv),
cs AS (
  SELECT g.source, g.v,
         sum(coalesce(c.cc, 0)) OVER (PARTITION BY g.source ORDER BY g.v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csv
  FROM g LEFT JOIN c ON g.source = c.source AND g.v = c.v
),
dv AS (
  SELECT cs.source, sz.ns, tt.n - sz.ns AS nr,
         abs(cs.csv * (tt.n - sz.ns) - (ct.ctv - cs.csv) * sz.ns) AS dev
  FROM cs JOIN ct ON cs.v = ct.v JOIN sz ON cs.source = sz.source CROSS JOIN tt
),
r AS (SELECT source, CAST(max(ns) AS BIGINT) AS nd, CAST(max(nr) AS BIGINT) AS nre,
             CAST(max(dev) AS BIGINT) AS dnum
      FROM dv GROUP BY source)
SELECT source, nd AS "NDocs", nre AS "NRest", dnum AS "DNum",
       CAST(dnum AS DOUBLE) / (nd * nre) AS "D",
       (CAST(dnum AS HUGEINT) * dnum * ${KsCritDen * KsCritDen} >
        CAST(${KsCritNum * KsCritNum} AS HUGEINT) * nd * nre * (nd + nre)) AS "Drifted"
FROM r ORDER BY source
"""
  }

  /** Triangle-count mirror: the same co-purchase edge universe (the
    * pagerank mirror's self-join form, cap interpolated), triangles
    * enumerated by plain ID ordering (a<b<c) — deliberately NOT the
    * engine's degree orientation, so hash equality proves the
    * oriented plan counts the identical triangle set. */
  val graphTriangles: String = {
    import graft.ops.GraphOps._
    s"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS (SELECT src AS n, count(*) AS dg FROM e GROUP BY src),
eu AS (SELECT src AS s, dst AS d FROM e WHERE src < dst),
tri AS (SELECT e1.s AS a, e1.d AS b, e2.d AS c
        FROM eu e1 JOIN eu e2 ON e2.s = e1.d
                   JOIN eu e3 ON e3.s = e1.s AND e3.d = e2.d),
tn AS (SELECT x.n, count(*) AS t
       FROM (SELECT a AS n FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri) x
       GROUP BY x.n)
SELECT deg.n AS "PartKey", CAST(deg.dg AS BIGINT) AS "Degree",
       CAST(COALESCE(tn.t, 0) AS BIGINT) AS "NTriangles",
       CASE WHEN deg.dg >= 2
            THEN CAST(2 * COALESCE(tn.t, 0) AS DOUBLE) / CAST(deg.dg * (deg.dg - 1) AS DOUBLE)
            ELSE 0.0 END AS "ClustCoeff"
FROM deg LEFT JOIN tn ON deg.n = tn.n
ORDER BY "PartKey"
"""
  }

  /** Label-propagation mirror: the same co-purchase edge universe and
    * the SAME [[graft.ops.GraphOps.LpaRounds]] synchronous rounds
    * unrolled as chained CTEs. The engine's per-node argmax is
    * max(struct(Cnt, −Lbl)); the mirror expresses the identical rule
    * as "min(lbl) among the labels attaining the round's max neighbor
    * count" — pure integer counts and min/max, so the labeling is
    * bit-identical across engines. */
  /** Shared CTE chain for the LPA-derived mirrors: the co-purchase
    * edge universe, per-node degrees, and [[graft.ops.GraphOps
    * .LpaRounds]] synchronous vote rounds unrolled — the final
    * labeling is `l$LpaRounds (node, lbl)`. The engine's per-node
    * vote (label_argmax: highest count, ties to the lowest label) is
    * expressed as "min(lbl) among labels attaining the round's max
    * neighbor count" — pure integer counts and min/max, so the
    * labeling is bit-identical across engines. */
  private def lpaChainCtes: String = {
    import graft.ops.GraphOps._
    val rounds = (1 to LpaRounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (SELECT e.dst, p.lbl, count(*) AS c
       FROM e JOIN $prev p ON e.src = p.node GROUP BY e.dst, p.lbl),
m$i AS (SELECT dst, max(c) AS mc FROM c$i GROUP BY dst),
l$i AS (SELECT c$i.dst AS node, min(c$i.lbl) AS lbl
       FROM c$i JOIN m$i ON c$i.dst = m$i.dst AND c$i.c = m$i.mc
       GROUP BY c$i.dst)"""
    }.mkString(",\n")
    s"""li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
l0 AS (SELECT src AS node, src AS lbl FROM deg),
$rounds"""
  }

  val graphLabelPropagation: String = {
    import graft.ops.GraphOps._
    s"""
WITH $lpaChainCtes,
sz AS (SELECT lbl, count(*) AS s FROM l$LpaRounds GROUP BY lbl)
SELECT f.node AS "PartKey", f.lbl AS "Community", CAST(sz.s AS BIGINT) AS "CommunitySize"
FROM l$LpaRounds f JOIN sz ON f.lbl = sz.lbl
ORDER BY f.node
"""
  }

  /** Modularity mirror: the same LPA labeling
    * ([[lpaChainCtes]]), then per community the directed
    * intra-edge count, size, degree sum, and the Newman–Girvan
    * contribution e_c/2m − (D_c/2m)² — the double arithmetic in the
    * engine's exact operation order (divide first, square by
    * multiplication), so the doubles are IEEE-bit-identical. */
  val graphModularity: String = {
    import graft.ops.GraphOps._
    s"""
WITH $lpaChainCtes,
nl AS (SELECT node, lbl FROM l$LpaRounds),
tm AS (SELECT sum(outdeg) AS t2m FROM deg),
ie AS (SELECT a.lbl, count(*) AS iec
       FROM e JOIN nl a ON e.src = a.node JOIN nl b ON e.dst = b.node
       WHERE a.lbl = b.lbl GROUP BY a.lbl),
cm AS (SELECT nl.lbl, count(*) AS cs, sum(deg.outdeg) AS ds
       FROM nl JOIN deg ON nl.node = deg.src GROUP BY nl.lbl)
SELECT cm.lbl AS "Community",
       CAST(cm.cs AS BIGINT) AS "CommunitySize",
       CAST(coalesce(ie.iec, 0) AS BIGINT) AS "IntraEdges",
       CAST(cm.ds AS BIGINT) AS "DegreeSum",
       CAST(coalesce(ie.iec, 0) AS DOUBLE) / CAST(tm.t2m AS DOUBLE)
         - (CAST(cm.ds AS DOUBLE) / CAST(tm.t2m AS DOUBLE))
           * (CAST(cm.ds AS DOUBLE) / CAST(tm.t2m AS DOUBLE)) AS "Contribution"
FROM cm LEFT JOIN ie ON cm.lbl = ie.lbl CROSS JOIN tm
ORDER BY "Community"
"""
  }

  /** k-core mirror: the same edge universe, the same exact-integer
    * density threshold ((7·⌊Σdeg/n⌋) div 10 — divisions in the
    * engine's order), and [[graft.ops.GraphOps.KcoreUnrollRounds]]
    * peels unrolled as chained CTEs — the engine converges within
    * that bound (asserted) and peeling is idempotent past the
    * fixpoint, so the fixed unroll equals the convergence run. */
  val graphKcore: String = {
    import graft.ops.GraphOps._
    // every CTE in the peel chain is MATERIALIZED — each round
    // references its predecessor TWICE (both edge endpoints), so
    // DuckDB's default inlining expands the chain 2^rounds-fold (the
    // PcaPower mirror lesson; here it surfaced as "too many open
    // files" from the exponentially re-read base table)
    val rounds = (1 to KcoreUnrollRounds).map { i =>
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT e.src AS n, count(*) AS c
       FROM e JOIN $prev a ON e.src = a.n JOIN $prev b ON e.dst = b.n
       GROUP BY e.src),
s$i AS MATERIALIZED (SELECT n FROM d$i CROSS JOIN kv WHERE c >= kv.k)"""
    }.mkString(",\n")
    s"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS MATERIALIZED (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
kv AS MATERIALIZED (SELECT $KcoreDensityNum * (sum(outdeg) // count(*)) // $KcoreDensityDen AS k
       FROM deg),
s0 AS MATERIALIZED (SELECT src AS n FROM deg),
$rounds,
cd AS (SELECT e.src AS n, count(*) AS c
       FROM e JOIN s$KcoreUnrollRounds a ON e.src = a.n
                JOIN s$KcoreUnrollRounds b ON e.dst = b.n
       GROUP BY e.src)
SELECT deg.src AS "PartKey", CAST(deg.outdeg AS BIGINT) AS "Degree",
       (s.n IS NOT NULL) AS "InCore",
       CAST(coalesce(cd.c, 0) AS BIGINT) AS "CoreDegree"
FROM deg LEFT JOIN s$KcoreUnrollRounds s ON deg.src = s.n
         LEFT JOIN cd ON deg.src = cd.n
ORDER BY "PartKey"
"""
  }

  /** BFS-hops mirror: identical (max degree, min id) source pick,
    * [[graft.ops.GraphOps.BfsUnrollRounds]] min-propagation rounds
    * unrolled as MATERIALIZED CTEs (the kcore inlining lesson); the
    * engine converges within that bound (asserted) and min-propagation
    * is idempotent past the fixpoint. Unreached components stay NULL
    * on both sides. */
  val graphBfsHops: String = {
    import graft.ops.GraphOps._
    val rounds = (1 to BfsUnrollRounds).map { i =>
      val prev = if (i == 1) "h0" else s"h${i - 1}"
      s"""h$i AS MATERIALIZED (
  SELECT n, min(d) AS d FROM (
    SELECT e.dst AS n, p.d + 1 AS d FROM e JOIN $prev p ON e.src = p.n
    UNION ALL SELECT n, d FROM $prev) GROUP BY n)"""
    }.mkString(",\n")
    s"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS MATERIALIZED (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
sv AS MATERIALIZED (SELECT src AS s FROM deg ORDER BY outdeg DESC, src LIMIT 1),
h0 AS MATERIALIZED (SELECT s AS n, CAST(0 AS BIGINT) AS d FROM sv),
$rounds
SELECT deg.src AS "PartKey", CAST(deg.outdeg AS BIGINT) AS "Degree",
       CAST(h.d AS BIGINT) AS "Hops",
       (deg.src = sv.s) AS "IsSource"
FROM deg LEFT JOIN h$BfsUnrollRounds h ON deg.src = h.n CROSS JOIN sv
ORDER BY "PartKey"
"""
  }

  /** Connected-components mirror: identity-seeded synchronous
    * min-label propagation unrolled [[graft.ops.GraphOps.ComponentsUnrollRounds]]
    * MATERIALIZED rounds (idempotent past the diameter fixpoint; a
    * recursive closure — the dedup mirror's shape — would enumerate
    * node×label pairs, O(n²) on this graph's giant dense component).
    * Engine runs componentsOf's convergence loop; any corpus deeper
    * than the unroll hash-mismatches loudly. */
  val graphComponents: String = {
    import graft.ops.GraphOps.{ComponentsUnrollRounds, MaxOrderParts}
    val rounds = (1 to ComponentsUnrollRounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""l$i AS MATERIALIZED (
  SELECT n, min(lbl) AS lbl FROM (
    SELECT e.dst AS n, p.lbl FROM e JOIN $prev p ON e.src = p.n
    UNION ALL SELECT n, lbl FROM $prev) GROUP BY n)"""
    }.mkString(",\n")
    val last = s"l$ComponentsUnrollRounds"
    s"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS MATERIALIZED (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
l0 AS MATERIALIZED (SELECT src AS n, src AS lbl FROM deg),
$rounds,
sz AS (SELECT lbl, count(*) AS cs FROM $last GROUP BY lbl)
SELECT deg.src AS "PartKey", CAST(deg.outdeg AS BIGINT) AS "Degree",
       l.lbl AS "Component", CAST(sz.cs AS BIGINT) AS "ComponentSize"
FROM deg JOIN $last l ON deg.src = l.n JOIN sz ON l.lbl = sz.lbl
ORDER BY "PartKey"
"""
  }

  /** Degree-stats/assortativity mirror: long sums, the SAME
    * decimal(38,0) Pearson combination as the statsCorrelation
    * mirror, one IEEE division at the end. */
  val graphDegreeStats: String = {
    import graft.ops.GraphOps.MaxOrderParts
    s"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
gp AS (SELECT ok FROM li GROUP BY ok HAVING count(*) BETWEEN 2 AND $MaxOrderParts),
e AS MATERIALIZED (SELECT DISTINCT a.part AS src, b.part AS dst
      FROM li a JOIN gp ON a.ok = gp.ok JOIN li b ON a.ok = b.ok
      WHERE a.part <> b.part),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
nodes AS (SELECT count(*) AS nn, min(outdeg) AS mind, max(outdeg) AS maxd,
                 sum(outdeg) AS sumd FROM deg),
p AS (SELECT CAST(ds.outdeg AS BIGINT) AS x, CAST(dd.outdeg AS BIGINT) AS y
      FROM e JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src),
s AS (SELECT count(*) AS ne,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy FROM p),
c AS (SELECT ne, sx, sy,
             CAST(ne AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS numd,
             CAST(ne AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS dxd,
             CAST(ne AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS dyd
      FROM s)
SELECT CAST(nodes.nn AS BIGINT) AS "NNodes", CAST(c.ne AS BIGINT) AS "NEdges",
       CAST(nodes.mind AS BIGINT) AS "MinDegree",
       CAST(nodes.sumd AS DOUBLE) / nodes.nn AS "MeanDegree",
       CAST(nodes.maxd AS BIGINT) AS "MaxDegree",
       CASE WHEN c.dxd = 0 OR c.dyd = 0 THEN NULL
            ELSE CAST(c.numd AS DOUBLE) /
                 (sqrt(CAST(c.dxd AS DOUBLE)) * sqrt(CAST(c.dyd AS DOUBLE))) END
         AS "Assortativity"
FROM nodes CROSS JOIN c
"""
  }

  /** PII-redaction mirror: identical planted contact line, identical
    * regexes (shared constants — both dialects parse them the same),
    * 'g' flag to match Spark's replace-all. */
  val textPiiRedact: String = s"""
WITH p AS (
  SELECT doc_id,
         text ||
         (CASE WHEN doc_id % 3 <> 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
               ELSE '' END) ||
         (CASE WHEN doc_id % 2 = 0
               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END) AS planted
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(planted, '${TextOps.EmailRe}')) AS INTEGER) AS "NEmails",
         CAST(len(regexp_extract_all(planted, '${TextOps.PhoneRe}')) AS INTEGER) AS "NPhones",
         regexp_replace(regexp_replace(planted, '${TextOps.EmailRe}', '<EMAIL>', 'g'),
                        '${TextOps.PhoneRe}', '<PHONE>', 'g') AS red
  FROM p
)
SELECT doc_id, "NEmails", "NPhones",
       md5(red) AS "RedactedHash",
       CAST(length(red) AS INTEGER) AS "NRedactedChars"
FROM r ORDER BY doc_id
"""

  /** Content-defined chunking CTE shared by [[textChunks]] and
    * [[dedupChunkOverlap]]: mirrors ExprKernels.rollingChunks exactly —
    * a cut after every ChunkWindow-codepoint window whose
    * Σ cp·pow hash is ≡ 0 mod ChunkDivisor (DuckDB substr/length/
    * unicode are codepoint-based, as is the kernel). Ends with
    * `ch(doc_id, chs)` = per-doc chunk-md5 list, duplicates kept.
    * All parameters read from TextOps so the two sides cannot
    * drift. */
  private val chunkCte: String = {
    import graft.ops.TextOps.{ChunkDivisor, ChunkMod, ChunkPows, ChunkWindow}
    val w = ChunkWindow
    val plist = ChunkPows.map(p => s"CAST($p AS BIGINT)").mkString("[", ",", "]")
    s"""
WITH c AS (
  SELECT doc_id, text, length(text) AS n,
         [i + $w for i in range(1, greatest(length(text) - $w + 2, 1))
          if list_sum([CAST(unicode(substr(text, i + j - 1, 1)) AS BIGINT) * $plist[j] for j in range(1, ${w + 1})]) % $ChunkMod % $ChunkDivisor = 0] AS mids
  FROM documents
),
cu AS (
  SELECT doc_id, text,
         list_sort(list_distinct(list_append(list_prepend(1, [m for m in mids if m <= n]), n + 1))) AS cuts
  FROM c
),
ch AS (
  SELECT doc_id,
         [md5(substr(text, cuts[k], cuts[k+1] - cuts[k])) for k in range(1, len(cuts)) if cuts[k+1] > cuts[k]] AS chs
  FROM cu
)"""
  }

  val textChunks: String = chunkCte + """
SELECT doc_id,
       CAST(len(chs) AS INTEGER) AS "NChunks",
       CAST(len(list_distinct(chs)) AS INTEGER) AS "NDistinctChunks",
       md5(array_to_string(list_sort(list_distinct(chs)), ' ')) AS "ChunksetMd5"
FROM ch ORDER BY doc_id
"""

  val dedupChunkOverlap: String = chunkCte + s""",
e AS (
  SELECT doc_id, unnest(list_distinct(chs)) AS h
  FROM ch
),
-- denominators (nd) are counted over the SAME below-cap chunk
-- universe as the shared-chunk numerator (see DedupOps.chunkOverlap)
ecool AS (
  SELECT e.doc_id, e.h,
         count(*) OVER (PARTITION BY e.doc_id) AS nd
  FROM e
  JOIN (SELECT h FROM e GROUP BY h
        HAVING count(*) <= ${graft.ops.TextOps.HotChunkMaxOccupancy}) k
  ON e.h = k.h
),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.nd AS nd1, b.nd AS nd2, count(*) AS ns
  FROM ecool a JOIN ecool b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT d1 AS "D1", d2 AS "D2", CAST(ns AS BIGINT) AS "NShared",
       CAST(ns AS DOUBLE) / least(nd1, nd2) AS "OverlapFrac"
FROM p WHERE CAST(ns AS DOUBLE) / least(nd1, nd2) >= ${graft.ops.TextOps.MinChunkOverlap}
ORDER BY "D1", "D2"
"""

  /** Source-vs-source vocabulary similarity mirror: distinct (source,
    * shingle) pairs, H min(md5(h|shingle)) signature aggregates, exact
    * pairwise intersection via the shingle self-join, estimate =
    * fraction of agreeing signature components. */
  private def sourceSigCtes: String = {
    val h = graft.ops.TextOps.SourceSimHashes
    val sigCols = (1 to h)
      .map(i => s"min(md5('$i|' || shingle)) AS h$i").mkString(",\n         ")
    s"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
e AS (
  SELECT DISTINCT source, unnest($shExpr) AS shingle FROM toks
),
sig AS (
  SELECT source, count(*) AS nsh,
         $sigCols
  FROM e GROUP BY source
)"""
  }

  private def sourceSigAgree: String = {
    val h = graft.ops.TextOps.SourceSimHashes
    (1 to h).map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")
  }

  /** Estimate-only mirror (the declared 100 TB query): signatures and
    * sizes, no shingle-keyed self-join. */
  val textSourceSimilarity: String = {
    val h = graft.ops.TextOps.SourceSimHashes
    sourceSigCtes + s"""
SELECT a.source AS "SA", b.source AS "SB",
       CAST(a.nsh AS BIGINT) AS "NShA", CAST(b.nsh AS BIGINT) AS "NShB",
       CAST($sourceSigAgree AS DOUBLE) / $h.0 AS "EstJaccard"
FROM sig a JOIN sig b ON a.source < b.source
ORDER BY "SA", "SB"
"""
  }

  /** Calibration mirror: the estimate alongside the exact pairwise
    * intersection via the shingle self-join. */
  val textSourceSimilarityCalibrate: String = {
    val h = graft.ops.TextOps.SourceSimHashes
    sourceSigCtes + s""",
inter AS (
  SELECT x.source AS ia, y.source AS ib, count(*) AS ns
  FROM e x JOIN e y ON x.shingle = y.shingle AND x.source < y.source
  GROUP BY x.source, y.source
)
SELECT a.source AS "SA", b.source AS "SB",
       CAST(a.nsh AS BIGINT) AS "NShA", CAST(b.nsh AS BIGINT) AS "NShB",
       CAST(COALESCE(i.ns, 0) AS BIGINT) AS "NShared",
       CAST(COALESCE(i.ns, 0) AS DOUBLE)
         / CAST(a.nsh + b.nsh - COALESCE(i.ns, 0) AS DOUBLE) AS "ExactJaccard",
       CAST($sourceSigAgree AS DOUBLE) / $h.0 AS "EstJaccard"
FROM sig a JOIN sig b ON a.source < b.source
LEFT JOIN inter i ON a.source = i.ia AND b.source = i.ib
ORDER BY "SA", "SB"
"""
  }

  /** KMV/theta source-overlap mirror: the bottom-k of each pair's
    * hash union recomputed relationally (the oracle may shuffle and
    * rank every key; the engine's sketch may not), then the identical
    * estimate arithmetic — constants interpolated from
    * RelationalOps.KmvK so both engines compute the same doubles in
    * the same operation order (the kmvDistinct pattern). One CTE body
    * under both the batch query (estimate + exact certificate) and
    * the streaming twin (estimate-only production columns). */
  private def sourceOverlapCtes: String = {
    val k = graft.ops.RelationalOps.KmvK
    val dUnion = (k - 1).toDouble * 281474976710656.0
    val cInter = dUnion / k
    s"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
e AS (
  SELECT DISTINCT source, unnest($shExpr) AS shingle FROM toks
),
hs AS (SELECT DISTINCT source, ${hex48("md5(shingle)")} AS v FROM e),
srcs AS (SELECT source, count(*) AS n FROM hs GROUP BY source),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
  FROM srcs a, srcs b WHERE a.source < b.source
),
uv AS (
  SELECT p.sa, p.sb, h.v,
         max(CASE WHEN h.source = p.sa THEN 1 ELSE 0 END) AS ia,
         max(CASE WHEN h.source = p.sb THEN 1 ELSE 0 END) AS ib
  FROM pairs p JOIN hs h ON h.source IN (p.sa, p.sb)
  GROUP BY p.sa, p.sb, h.v
),
rk AS (SELECT sa, sb, v, ia, ib,
              row_number() OVER (PARTITION BY sa, sb ORDER BY v) AS rn FROM uv),
sk AS (SELECT sa, sb, count(*) AS sz, max(v) AS kth, sum(ia * ib) AS matched,
              sum(ia) AS ina, sum(ib) AS inb
       FROM rk WHERE rn <= $k GROUP BY sa, sb),
-- each source's OWN bottom-k order statistics (the difference query's
-- per-source cardinality estimate)
srk AS (SELECT source, v,
               row_number() OVER (PARTITION BY source ORDER BY v) AS rn FROM hs),
skth AS (SELECT source, count(*) AS sz, max(v) AS kth
         FROM srk WHERE rn <= $k GROUP BY source),
ex AS (SELECT sa, sb, sum(ia * ib) AS exact FROM uv GROUP BY sa, sb),
fin AS (
  SELECT p.sa, p.sb, p.na, p.nb,
         CAST(e.exact AS BIGINT) AS exact,
         CASE WHEN s.sz >= $k THEN CAST($dUnion AS DOUBLE) / CAST(s.kth AS DOUBLE)
              ELSE CAST(s.sz AS DOUBLE) END AS est_union,
         CASE WHEN s.sz >= $k
              THEN CAST(s.matched AS DOUBLE) * CAST($cInter AS DOUBLE)
                     / CAST(s.kth AS DOUBLE)
              ELSE CAST(s.matched AS DOUBLE) END AS est_overlap,
         s.matched AS matched, s.sz AS sz, s.kth AS kth,
         s.ina AS ina, s.inb AS inb,
         ka.sz AS a_sz, ka.kth AS a_kth, kb.sz AS b_sz, kb.kth AS b_kth
  FROM pairs p
  JOIN sk s ON s.sa = p.sa AND s.sb = p.sb
  JOIN ex e ON e.sa = p.sa AND e.sb = p.sb
  JOIN skth ka ON ka.source = p.sa
  JOIN skth kb ON kb.source = p.sb
)
"""
  }

  val sketchSourceOverlap: String = {
    val k = graft.ops.RelationalOps.KmvK
    sourceOverlapCtes + s"""
SELECT sa AS "SA", sb AS "SB",
       CAST(na AS BIGINT) AS "NShA", CAST(nb AS BIGINT) AS "NShB",
       exact AS "ExactOverlap",
       est_union AS "EstUnion", est_overlap AS "EstOverlap",
       (abs(est_overlap - CAST(exact AS DOUBLE))
          <= 4.0 * (est_union / $k.0)
               * sqrt(CAST(matched AS DOUBLE) + 1.0)) AS "ErrOk"
FROM fin ORDER BY "SA", "SB"
"""
  }

  /** Directional difference / containment mirror — the same CTE body,
    * with each source's own bottom-k recomputed relationally (srk/
    * skth) and the EstOverlap arithmetic applied to the union's
    * side-membership counts. Operation order mirrors
    * TextOps.kmvDifferencePairs column for column. */
  val sketchSourceDifference: String = {
    val k = graft.ops.RelationalOps.KmvK
    val dUnion = (k - 1).toDouble * 281474976710656.0
    val cInter = dUnion / k
    sourceOverlapCtes + s"""
SELECT sa AS "SA", sb AS "SB",
       est_a AS "EstA", est_b AS "EstB",
       est_aonly AS "EstAOnly", est_bonly AS "EstBOnly",
       CAST(na - exact AS BIGINT) AS "ExactAOnly",
       CAST(nb - exact AS BIGINT) AS "ExactBOnly",
       est_overlap / est_a AS "ContainAB",
       est_overlap / est_b AS "ContainBA",
       (abs(est_aonly - CAST(na - exact AS DOUBLE))
          <= 4.0 * (est_union / $k.0)
               * sqrt(CAST(ina - matched AS DOUBLE) + 1.0)) AS "ErrOkA",
       (abs(est_bonly - CAST(nb - exact AS DOUBLE))
          <= 4.0 * (est_union / $k.0)
               * sqrt(CAST(inb - matched AS DOUBLE) + 1.0)) AS "ErrOkB"
FROM (
  SELECT fin.*,
         CASE WHEN a_sz >= $k THEN CAST($dUnion AS DOUBLE) / CAST(a_kth AS DOUBLE)
              ELSE CAST(a_sz AS DOUBLE) END AS est_a,
         CASE WHEN b_sz >= $k THEN CAST($dUnion AS DOUBLE) / CAST(b_kth AS DOUBLE)
              ELSE CAST(b_sz AS DOUBLE) END AS est_b,
         CASE WHEN sz >= $k
              THEN CAST(ina - matched AS DOUBLE) * CAST($cInter AS DOUBLE)
                     / CAST(kth AS DOUBLE)
              ELSE CAST(ina - matched AS DOUBLE) END AS est_aonly,
         CASE WHEN sz >= $k
              THEN CAST(inb - matched AS DOUBLE) * CAST($cInter AS DOUBLE)
                     / CAST(kth AS DOUBLE)
              ELSE CAST(inb - matched AS DOUBLE) END AS est_bonly
  FROM fin
) d ORDER BY "SA", "SB"
"""
  }

  /** Estimate-only difference mirror for the streaming twin — the
    * sketch-derived columns only (no whole-corpus exact certificate),
    * same nested CASE arithmetic as [[sketchSourceDifference]]. */
  val sketchSourceDifferenceStream: String = {
    val k = graft.ops.RelationalOps.KmvK
    val dUnion = (k - 1).toDouble * 281474976710656.0
    val cInter = dUnion / k
    sourceOverlapCtes + s"""
SELECT sa AS "SA", sb AS "SB",
       est_a AS "EstA", est_b AS "EstB",
       est_aonly AS "EstAOnly", est_bonly AS "EstBOnly",
       est_overlap / est_a AS "ContainAB",
       est_overlap / est_b AS "ContainBA"
FROM (
  SELECT fin.*,
         CASE WHEN a_sz >= $k THEN CAST($dUnion AS DOUBLE) / CAST(a_kth AS DOUBLE)
              ELSE CAST(a_sz AS DOUBLE) END AS est_a,
         CASE WHEN b_sz >= $k THEN CAST($dUnion AS DOUBLE) / CAST(b_kth AS DOUBLE)
              ELSE CAST(b_sz AS DOUBLE) END AS est_b,
         CASE WHEN sz >= $k
              THEN CAST(ina - matched AS DOUBLE) * CAST($cInter AS DOUBLE)
                     / CAST(kth AS DOUBLE)
              ELSE CAST(ina - matched AS DOUBLE) END AS est_aonly,
         CASE WHEN sz >= $k
              THEN CAST(inb - matched AS DOUBLE) * CAST($cInter AS DOUBLE)
                     / CAST(kth AS DOUBLE)
              ELSE CAST(inb - matched AS DOUBLE) END AS est_bonly
  FROM fin
) d ORDER BY "SA", "SB"
"""
  }

  /** Estimate-only mirror for the streaming twin — the declared
    * production columns (no whole-corpus exact certificate). */
  val sketchSourceOverlapStream: String = sourceOverlapCtes + """
SELECT sa AS "SA", sb AS "SB",
       CAST(matched AS INTEGER) AS "Matched",
       est_union AS "EstUnion", est_overlap AS "EstOverlap"
FROM fin ORDER BY "SA", "SB"
"""

  // ---------- similarity ----------

  private val quantCte: String = """
WITH q AS (
  SELECT vec_id, label,
         [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT) for x in embedding] AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, label, qv,
         list_sum([qv[i] * qv[i] for i in range(1, len(qv)+1)]) AS nn
  FROM q
)"""

  /** Sign-random-projection mirror: the SAME ±1 matrix interpolated
    * from [[graft.ops.SimilarityOps.RpSigns]] (the kmeans-constants
    * pattern — a seed change cannot silently diverge the engines),
    * exact integer dot per output dim, HUGEINT-cast per the house
    * rule. */
  val similarityRandomProjection: String = {
    val signsLit = graft.ops.SimilarityOps.RpSigns
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    quantCte + s""",
sg AS (SELECT $signsLit AS m)
SELECT n.vec_id,
       CAST(t.k AS INTEGER) AS "Dim",
       CAST(list_sum([sg.m[t.k][j] * n.qv[j] for j in range(1, len(n.qv)+1)]) AS BIGINT) AS "V"
FROM n, sg, range(1, ${graft.ops.SimilarityOps.RpOutDims + 1}) t(k)
ORDER BY n.vec_id, "Dim"
"""
  }

  val similarityTopk: String = quantCte + """
, p AS (
  SELECT a.vec_id AS "QId", b.vec_id AS "NId",
         list_sum([a.qv[i] * b.qv[i] for i in range(1, len(a.qv)+1)]) AS dot,
         a.nn AS na, b.nn AS nb
  FROM n a JOIN n b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 8
),
c AS (
  SELECT "QId", "NId",
         CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS "Cosine"
  FROM p
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY "QId" ORDER BY "Cosine" DESC, "NId") AS INTEGER) AS "Rank"
  FROM c
)
SELECT "QId", "NId", "Cosine", "Rank" FROM r WHERE "Rank" <= 5
ORDER BY "QId", "Rank"
"""

  /** kNN-graph mirror: full corpus self-join on the same quantized
    * integer dots, same (Cosine desc, NId) row_number cut, Mutual as
    * exact reverse-edge membership via a self left-join on the k-cut
    * edge set. */
  val similarityKnnGraph: String = {
    val k = graft.ops.SimilarityOps.KnnGraphK
    quantCte + s"""
, p AS (
  SELECT a.vec_id AS s, b.vec_id AS t,
         list_sum([a.qv[i] * b.qv[i] for i in range(1, len(a.qv)+1)]) AS dot,
         a.nn AS na, b.nn AS nb
  FROM n a JOIN n b ON b.vec_id <> a.vec_id
),
c AS (
  SELECT s, t,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
  FROM p
),
r AS (
  SELECT s, t, cos,
         CAST(row_number() OVER (PARTITION BY s ORDER BY cos DESC, t) AS INTEGER) AS rk
  FROM c
),
kk AS (SELECT s, t, cos, rk FROM r WHERE rk <= $k)
SELECT kk.s AS "SrcId", kk.t AS "NId", kk.cos AS "Cosine", kk.rk AS "Rank",
       (m.s IS NOT NULL) AS "Mutual"
FROM kk LEFT JOIN kk m ON m.s = kk.t AND m.t = kk.s
ORDER BY "SrcId", "Rank"
"""
  }

  /** Trained-quality-classifier mirror: identical integer weak label
    * (min-tokens + doubled stop-tf rule), identical per-class
    * document frequencies over distinct (doc, term) rows, identical
    * Laplace cross-multiply vote sign, identical majority tally —
    * no doubles anywhere in the model. */
  val textQualityClassifier: String = {
    import graft.ops.TextOps.QcMinTokens
    toksCte + s"""
, ex AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS dl, unnest(t) AS tok FROM toks),
pt AS (SELECT doc_id, dl, tok, count(*) AS tfc FROM ex GROUP BY doc_id, dl, tok),
lab AS (
  SELECT doc_id,
         (max(dl) >= $QcMinTokens AND
          2 * sum(CASE WHEN tok IN (${sqlList(graft.ops.TextOps.stopwords)})
                       THEN tfc ELSE 0 END) <= max(dl)) AS label
  FROM pt GROUP BY doc_id
),
pr AS (SELECT sum(CASE WHEN label THEN 1 ELSE 0 END) AS g,
              sum(CASE WHEN label THEN 0 ELSE 1 END) AS b
       FROM lab),
md AS (SELECT pt.tok,
              sum(CASE WHEN lab.label THEN 1 ELSE 0 END) AS gw,
              sum(CASE WHEN lab.label THEN 0 ELSE 1 END) AS bw
       FROM pt JOIN lab ON pt.doc_id = lab.doc_id
       GROUP BY pt.tok),
vt AS (SELECT tok,
              CASE WHEN (gw + 1) * (b + 2) > (bw + 1) * (g + 2) THEN 1
                   WHEN (gw + 1) * (b + 2) < (bw + 1) * (g + 2) THEN -1
                   ELSE 0 END AS vote
       FROM md CROSS JOIN pr),
sc AS (SELECT pt.doc_id,
              sum(CASE WHEN vote = 1 THEN 1 ELSE 0 END) AS vg,
              sum(CASE WHEN vote = -1 THEN 1 ELSE 0 END) AS vb
       FROM pt JOIN vt ON pt.tok = vt.tok
       GROUP BY pt.doc_id)
SELECT sc.doc_id, lab.label AS "Label",
       CAST(vg AS BIGINT) AS "VotesGood", CAST(vb AS BIGINT) AS "VotesBad",
       (vg > vb) AS "Predicted", ((vg > vb) = lab.label) AS "Correct"
FROM sc JOIN lab ON sc.doc_id = lab.doc_id
ORDER BY sc.doc_id
"""
  }

  /** PCA-power mirror: the same exact-integer scatter matrix and the
    * same [[graft.ops.SimilarityOps.PcaPowerRounds]] fixed-point
    * rounds unrolled as hugeint CTEs; truncating `//` matches the
    * engine's BigInt division. */
  val similarityPcaPower: String = {
    import graft.ops.SimilarityOps.{PcaPowerRounds, PcaVecScale}
    // every CTE in the chain is MATERIALIZED: unmaterialized, DuckDB
    // inlines each round into its consumer — two references per round
    // expands 2^rounds-fold, and even a strictly-linear chain (renorm
    // via a whole-partition window max, one reference per round)
    // builds an optimizer tree super-linear in depth that stalled at
    // 96 rounds. Materialization makes the chain genuinely
    // sequential: 64 rows per step, 1.4 s total at sf0.01.
    val rounds = (1 to PcaPowerRounds).map { r =>
      s""",
w$r AS MATERIALIZED (
  SELECT s.i, sum(s.sv * v.vv) AS wv
  FROM sm s JOIN v${r - 1} v ON v.i = s.j
  GROUP BY s.i
),
v$r AS MATERIALIZED (SELECT i, (wv * $PcaVecScale) // (max(abs(wv)) OVER ()) AS vv FROM w$r)"""
    }.mkString
    quantCte + s"""
, nm AS MATERIALIZED (SELECT vec_id, qv, nn FROM n),
dims AS (SELECT unnest(range(1, 65)) AS i),
cn AS (SELECT CAST(count(*) AS HUGEINT) AS c FROM nm),
sx AS (SELECT d.i, sum(v.qv[d.i]) AS s FROM nm v CROSS JOIN dims d GROUP BY d.i),
sxx AS (SELECT a.i, b.i AS j, sum(v.qv[a.i] * v.qv[b.i]) AS p
        FROM nm v CROSS JOIN dims a CROSS JOIN dims b GROUP BY a.i, b.i),
sm AS MATERIALIZED (SELECT x.i, x.j, cn.c * x.p - sa.s * sb.s AS sv
       FROM sxx x JOIN sx sa ON sa.i = x.i JOIN sx sb ON sb.i = x.j CROSS JOIN cn),
v0 AS (SELECT i, CAST($PcaVecScale AS HUGEINT) AS vv FROM dims)$rounds,
tr AS (SELECT sum(sv) AS t FROM sm WHERE i = j),
wf AS (SELECT s.i, sum(s.sv * v.vv) AS wv
       FROM sm s JOIN v$PcaPowerRounds v ON v.i = s.j GROUP BY s.i),
ray AS (SELECT sum(v.vv * w.wv) AS num, sum(v.vv * v.vv) AS den
        FROM v$PcaPowerRounds v JOIN wf w ON w.i = v.i)
SELECT CAST(v.i - 1 AS INTEGER) AS "Dim", CAST(v.vv AS BIGINT) AS "V",
       CAST((ray.num * 1000000) // (ray.den * tr.t) AS BIGINT) AS "EvrPpm"
FROM v$PcaPowerRounds v CROSS JOIN ray CROSS JOIN tr
ORDER BY "Dim"
"""
  }

  /** MMR mirror: the same greedy selection, each round one chained
    * CTE (the PageRank/BPE unrolling pattern). λ = 1/2 ⇒ every score
    * is an exact halving of a difference of the engine's own cosine
    * doubles, so selection order and scores hash-match. */
  val similarityMmrTopk: String = {
    import graft.ops.SimilarityOps.{ProbeIdMax, MmrCandK, MmrSelectK}
    val rounds = (2 to MmrSelectK).map { r =>
      s""",
m$r AS (
  SELECT c.qid, c.nid, c.rel, max(pr.sim) AS ms
  FROM cand c
  JOIN pr ON pr.qid = c.qid AND pr.a = c.nid
  JOIN sel${r - 1} s ON s.qid = pr.qid AND s.nid = pr.b
  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} x WHERE x.qid = c.qid AND x.nid = c.nid)
  GROUP BY c.qid, c.nid, c.rel
),
sel$r AS (
  SELECT qid, nid, score, selrank FROM sel${r - 1}
  UNION ALL
  SELECT qid, nid, (rel - ms) / 2 AS score, $r AS selrank FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY (rel - ms) / 2 DESC, nid) AS rn
    FROM m$r
  ) WHERE rn = 1
)"""
    }.mkString
    quantCte + s"""
, p0 AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         CAST(list_sum([a.qv[i] * b.qv[i] for i in range(1, len(a.qv)+1)]) AS DOUBLE)
           / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) AS rel
  FROM n a JOIN n b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < $ProbeIdMax
),
cand AS (
  SELECT qid, nid, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn FROM p0
  ) WHERE rn <= $MmrCandK
),
pr AS (
  SELECT c1.qid, c1.nid AS a, c2.nid AS b,
         CAST(list_sum([va.qv[i] * vb.qv[i] for i in range(1, len(va.qv)+1)]) AS DOUBLE)
           / (sqrt(CAST(va.nn AS DOUBLE)) * sqrt(CAST(vb.nn AS DOUBLE))) AS sim
  FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.nid <> c2.nid
  JOIN n va ON va.vec_id = c1.nid JOIN n vb ON vb.vec_id = c2.nid
),
sel1 AS (
  SELECT qid, nid, rel / 2 AS score, 1 AS selrank FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn FROM cand
  ) WHERE rn = 1
)$rounds
SELECT qid AS "QId", CAST(selrank AS INTEGER) AS "SelRank", nid AS "NId", score AS "MmrScore"
FROM sel$MmrSelectK
ORDER BY "QId", "SelRank"
"""
  }

  /** k-means codebook CTEs shared by every IVF-family oracle
    * ([[similarityIvfTopk]], [[similarityKmeansProfile]],
    * [[similaritySemanticDedup]]): seeds = K lowest vec_ids, then
    * KmeansRounds Lloyd rounds with exact integer L2² assignment
    * ((dist, cid) tie-break) and per-dimension truncating integer
    * mean (`//`, matching Spark's `div`). Appends to [[quantCte]];
    * ends with `af` = the final (vec_id → cid) assignment and
    * [[kmeansCFinal]] = the final codebook CTE name. */
  private def assignCte(name: String, cent: String): String = s"""
$name AS (
  SELECT vec_id AS avid, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             (v.nn - 2 * list_sum([v.qv[i] * c.cq[i] for i in range(1, len(v.qv)+1)]) + c.cn), c.cid) AS rn
    FROM n v CROSS JOIN $cent c
  ) WHERE rn = 1
)"""

  private def updateCte(name: String, assign: String): String = s"""
${name}d AS (
  SELECT a.cid, e.dim, CAST(sum(e.v) // count(*) AS BIGINT) AS cv
  FROM ed e JOIN $assign a ON e.vec_id = a.avid
  GROUP BY a.cid, e.dim
),
$name AS (
  SELECT cid, list(cv ORDER BY dim) AS cq, CAST(sum(cv * cv) AS BIGINT) AS cn
  FROM ${name}d GROUP BY cid
)"""

  private val kmeansCFinal: String =
    s"c${graft.ops.SimilarityOps.KmeansRounds}"

  /** Codebook CTE chain with the seed count K given as a SQL scalar
    * expression — the fixed-K mirrors pass the literal
    * DefaultNCentroids; the policy-K mirror passes the corpus-derived
    * GREATEST/round(sqrt(count)) expression, so the DERIVATION of K is
    * itself under the hash gate. */
  private def codebookCtesFor(kSql: String): String = {
    import graft.ops.SimilarityOps.KmeansRounds
    val rounds = (1 to KmeansRounds).map { r =>
      assignCte(s"a$r", s"c${r - 1}") + "," + updateCte(s"c$r", s"a$r")
    }.mkString(",")
    s"""
, ed AS (
  SELECT vec_id, i AS dim, qv[i] AS v
  FROM n CROSS JOIN range(1, 65) t(i)
),
c0 AS (SELECT vec_id AS cid, qv AS cq, nn AS cn FROM n WHERE vec_id < ($kSql)),""" +
      rounds + "," + assignCte("af", kmeansCFinal)
  }

  private val codebookCtes: String =
    codebookCtesFor(graft.ops.SimilarityOps.DefaultNCentroids.toString)

  /** The K ∝ √n policy as SQL — mirrors SimilarityOps.policyK; the
    * round() can never hit a .5 tie (see that scaladoc's proof), so
    * DuckDB's banker's rounding equals the JVM's HALF_UP for every
    * corpus size. */
  private val policyKSql: String = {
    import graft.ops.SimilarityOps.DefaultNCentroids
    s"SELECT GREATEST($DefaultNCentroids, CAST(round(sqrt(count(*))) AS BIGINT)) FROM n"
  }

  /** IVF-flat mirror. Every constant (k, centroids, nprobe, probe-id
    * cutoff, k-means rounds) is read from SimilarityOps so a default
    * change cannot silently lose oracle parity. */
  val similarityIvfTopk: String = {
    import graft.ops.SimilarityOps.{DefaultK, DefaultNProbe, ProbeIdMax}
    val cFinal = kmeansCFinal
    quantCte + codebookCtes + s""",
pl AS (
  SELECT qid, qp, np, cid FROM (
    SELECT p.vec_id AS qid, p.qv AS qp, p.nn AS np, c.cid,
           row_number() OVER (PARTITION BY p.vec_id ORDER BY
             (p.nn - 2 * list_sum([p.qv[i] * c.cq[i] for i in range(1, len(p.qv)+1)]) + c.cn), c.cid) AS rn
    FROM n p CROSS JOIN $cFinal c WHERE p.vec_id < $ProbeIdMax
  ) WHERE rn <= $DefaultNProbe
),
sc AS (
  SELECT pl.qid AS "QId", v.vec_id AS "NId",
         CAST(list_sum([pl.qp[i] * v.qv[i] for i in range(1, len(pl.qp)+1)]) AS DOUBLE)
           / (sqrt(CAST(pl.np AS DOUBLE)) * sqrt(CAST(v.nn AS DOUBLE))) AS "Cosine"
  FROM pl JOIN af a ON pl.cid = a.cid AND a.avid <> pl.qid
  JOIN n v ON a.avid = v.vec_id
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY "QId" ORDER BY "Cosine" DESC, "NId") AS INTEGER) AS "Rank"
  FROM sc
)
SELECT "QId", "NId", "Cosine", "Rank" FROM r WHERE "Rank" <= $DefaultK
ORDER BY "QId", "Rank"
"""
  }

  /** Routed-kNN-graph mirror: REPLAYS the approximation — the same
    * deterministic k-means codebook CTEs as the IVF mirrors, a
    * corpus-wide nprobe route ((L2², cid) tie-break, no probe-id
    * cutoff), candidates = routed-list members via the replayed final
    * assignment, then the exact graph mirror's rank / mutual stages
    * verbatim. A hash match here proves the routing, not just the
    * ranking. */
  val similarityKnnGraphIvf: String = {
    import graft.ops.SimilarityOps.{DefaultNProbe, KnnGraphK}
    val cFinal = kmeansCFinal
    quantCte + codebookCtes + s""",
pl AS (
  SELECT qid, qp, np, cid FROM (
    SELECT p.vec_id AS qid, p.qv AS qp, p.nn AS np, c.cid,
           row_number() OVER (PARTITION BY p.vec_id ORDER BY
             (p.nn - 2 * list_sum([p.qv[i] * c.cq[i] for i in range(1, len(p.qv)+1)]) + c.cn), c.cid) AS rn
    FROM n p CROSS JOIN $cFinal c
  ) WHERE rn <= $DefaultNProbe
),
sc AS (
  SELECT pl.qid AS s, v.vec_id AS t,
         CAST(list_sum([pl.qp[i] * v.qv[i] for i in range(1, len(pl.qp)+1)]) AS DOUBLE)
           / (sqrt(CAST(pl.np AS DOUBLE)) * sqrt(CAST(v.nn AS DOUBLE))) AS cos
  FROM pl JOIN af a ON pl.cid = a.cid AND a.avid <> pl.qid
  JOIN n v ON a.avid = v.vec_id
),
r AS (
  SELECT s, t, cos,
         CAST(row_number() OVER (PARTITION BY s ORDER BY cos DESC, t) AS INTEGER) AS rk
  FROM sc
),
kk AS (SELECT s, t, cos, rk FROM r WHERE rk <= $KnnGraphK)
SELECT kk.s AS "SrcId", kk.t AS "NId", kk.cos AS "Cosine", kk.rk AS "Rank",
       (m.s IS NOT NULL) AS "Mutual"
FROM kk LEFT JOIN kk m ON m.s = kk.t AND m.t = kk.s
ORDER BY "SrcId", "Rank"
"""
  }

  /** Cluster-profile mirror: members = the final k-means assignment,
    * per-member distance recomputed as exact integer L2² against the
    * ASSIGNED centroid; majority label via (count DESC, label) window;
    * sums cast back to BIGINT (DuckDB widens sum(BIGINT) to HUGEINT;
    * Spark keeps LongType). */
  val similarityKmeansProfile: String = {
    val cFinal = kmeansCFinal
    quantCte + codebookCtes + s""",
m AS (
  SELECT a.avid AS vec_id, a.cid, v.label,
         (v.nn - 2 * list_sum([v.qv[i] * c.cq[i] for i in range(1, len(v.qv)+1)]) + c.cn) AS dist
  FROM af a JOIN n v ON a.avid = v.vec_id JOIN $cFinal c ON a.cid = c.cid
),
lb AS (
  SELECT cid, label, count(*) AS lc, CAST(sum(dist) AS BIGINT) AS ld
  FROM m GROUP BY cid, label
),
pr AS (
  SELECT cid, CAST(sum(lc) AS BIGINT) AS nm, CAST(sum(ld) AS BIGINT) AS sd
  FROM lb GROUP BY cid
),
mj AS (
  SELECT cid, label AS ml, lc AS mc FROM (
    SELECT cid, label, lc,
           row_number() OVER (PARTITION BY cid ORDER BY lc DESC, label) AS rn
    FROM lb
  ) WHERE rn = 1
)
SELECT pr.cid AS "Cid", nm AS "NMembers", mj.ml AS "MajorityLabel", mj.mc AS "MajorityCount",
       CAST(mj.mc AS DOUBLE) / CAST(nm AS DOUBLE) AS "Purity",
       sd AS "SumDist",
       CAST(sd AS DOUBLE) / CAST(nm AS DOUBLE) AS "MeanDist"
FROM pr JOIN mj ON pr.cid = mj.cid ORDER BY "Cid"
"""
  }

  /** Embedding-outlier mirror: per-member distance recomputed against
    * the assigned centroid (same CTEs as the profile mirror); the
    * z-score verdict is the identical cross-multiplied-and-squared
    * integer comparison in HUGEINT (≡ Spark's decimal128), so no
    * division, sqrt, or float enters the decision. dist is CAST
    * BIGINT on output (DuckDB's list_sum runs in hugeint). */
  val similarityOutliers: String = {
    val cFinal = kmeansCFinal
    val s2 = graft.ops.SimilarityOps.OutlierSigmas * graft.ops.SimilarityOps.OutlierSigmas
    quantCte + codebookCtes + s""",
m AS (
  SELECT a.avid AS vec_id, a.cid,
         (v.nn - 2 * list_sum([v.qv[i] * c.cq[i] for i in range(1, len(v.qv)+1)]) + c.cn) AS dist
  FROM af a JOIN n v ON a.avid = v.vec_id JOIN $cFinal c ON a.cid = c.cid
),
st AS (
  SELECT cid, count(*) AS nm, CAST(sum(dist) AS BIGINT) AS sd,
         sum(CAST(dist AS HUGEINT) * dist) AS sd2
  FROM m GROUP BY cid
),
v AS (
  SELECT m.vec_id, m.cid, m.dist, st.nm, st.sd,
         CAST(m.dist AS HUGEINT) * st.nm - st.sd AS dev,
         CAST(st.nm AS HUGEINT) * st.sd2 - CAST(st.sd AS HUGEINT) * st.sd AS vt
  FROM m JOIN st ON m.cid = st.cid
)
SELECT vec_id, cid AS "Cid", CAST(dist AS BIGINT) AS "DistQ",
       nm AS "NMembers",
       CAST(dev AS BIGINT) AS "DevQ",
       CAST(sd AS DOUBLE) / nm AS "MeanClusterDist",
       (dev > 0 AND dev * dev > $s2 * vt) AS "IsOutlier"
FROM v ORDER BY vec_id
"""
  }

  /** Medoid mirror: the same sum-vector identity (per-cluster
    * per-dimension integer sums, then `n·nn − 2·q·S + Σnn` per member)
    * — no pairwise term in either engine; argmin via (dist, id)
    * row_number. */
  val similarityMedoids: String = {
    val cFinal = kmeansCFinal
    quantCte + codebookCtes + s""",
sv AS (
  SELECT a.cid, e.dim, CAST(sum(e.v) AS BIGINT) AS svv
  FROM ed e JOIN af a ON e.vec_id = a.avid GROUP BY a.cid, e.dim
),
sarr AS (SELECT cid, list(svv ORDER BY dim) AS s FROM sv GROUP BY cid),
stt AS (SELECT a.cid, count(*) AS nm, CAST(sum(v.nn) AS BIGINT) AS snn
        FROM af a JOIN n v ON a.avid = v.vec_id GROUP BY a.cid),
md AS (
  SELECT a.cid, v.vec_id,
         stt.nm * v.nn
           - 2 * list_sum([v.qv[i] * sarr.s[i] for i in range(1, len(v.qv)+1)])
           + stt.snn AS td
  FROM af a JOIN n v ON a.avid = v.vec_id
  JOIN sarr ON a.cid = sarr.cid JOIN stt ON a.cid = stt.cid
),
r AS (SELECT cid, vec_id, td,
             row_number() OVER (PARTITION BY cid ORDER BY td, vec_id) AS rn
      FROM md)
SELECT r.cid AS "Cid", stt.nm AS "NMembers", r.vec_id AS "MedoidId",
       CAST(r.td AS BIGINT) AS "MedoidTotalDistQ",
       CASE WHEN stt.nm > 1 THEN CAST(r.td AS DOUBLE) / (stt.nm - 1)
            ELSE CAST(0.0 AS DOUBLE) END AS "MeanDistToMedoid"
FROM r JOIN stt ON r.cid = stt.cid WHERE rn = 1 ORDER BY "Cid"
"""
  }

  /** SemDeDup-style semantic-dedup mirror: candidates are pairs WITHIN
    * a final k-means cluster only (never all-pairs); a vector is a
    * duplicate iff some LOWER-id same-cluster vector reaches the
    * shared cosine threshold. Cosine is the same
    * exact-integer-dot / sqrt·sqrt expression as every other
    * similarity oracle. */
  val similaritySemanticDedup: String =
    semanticDedupMirrorOver(codebookCtes)

  /** Policy-K mirror: same tail, codebook chain seeded by the
    * corpus-derived [[policyKSql]] — both engines DERIVE K and must
    * land on identical clusters. */
  val similaritySemanticDedupAuto: String =
    semanticDedupMirrorOver(codebookCtesFor(policyKSql))

  private def semanticDedupMirrorOver(codebook: String): String = {
    val thr = graft.ops.SimilarityOps.DefaultSemDedupThreshold
    quantCte + codebook + s""",
mem AS (
  SELECT a.avid AS vec_id, a.cid, v.label, v.qv, v.nn
  FROM af a JOIN n v ON a.avid = v.vec_id
),
pr AS (
  SELECT b.vec_id AS v2, count(*) AS nd
  FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE CAST(list_sum([a.qv[i] * b.qv[i] for i in range(1, len(a.qv)+1)]) AS DOUBLE)
        / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) >= $thr
  GROUP BY b.vec_id
)
SELECT m.vec_id, m.cid AS "Cid", m.label,
       CAST(COALESCE(pr.nd, 0) AS BIGINT) AS "NDupEarlier",
       (COALESCE(pr.nd, 0) > 0) AS "IsDup"
FROM mem m LEFT JOIN pr ON m.vec_id = pr.v2
ORDER BY m.vec_id
"""
  }

  /** Hybrid-retrieval (RRF) mirror: the two branch mirrors nested
    * VERBATIM as CTE subqueries (DuckDB allows a full WITH query
    * inside a CTE), so branch semantics are shared by construction;
    * fusion is `Σ 1/(K + rank)` over INTEGER ranks — each term one
    * exactly-rounded double division (CAST 1 AS DOUBLE: a bare 1.0
    * literal is DECIMAL in DuckDB, the HUGEINT house rule's cousin),
    * the score one addition of two such doubles. Tie-break
    * (score DESC, doc_id) is total, so fused ranks are deterministic. */
  val retrievalHybridRrf: String = {
    import graft.ops.RetrievalOps.{RrfK, RrfTopK}
    val qids = graft.ops.TextOps.Bm25Queries.map(_._1).mkString(", ")
    s"""
WITH lex AS ($textBm25Topk),
vec AS ($similarityTopk),
u AS (
  SELECT COALESCE(l."QueryId", CAST(v."QId" AS INTEGER)) AS qid,
         COALESCE(l.doc_id, v."NId") AS did,
         l."Rank" AS lexrank, v."Rank" AS vecrank
  FROM lex l
  FULL OUTER JOIN (SELECT * FROM vec WHERE "QId" IN ($qids)) v
    ON l."QueryId" = v."QId" AND l.doc_id = v."NId"
),
s AS (
  SELECT qid, did, lexrank, vecrank,
         COALESCE(CAST(1 AS DOUBLE) / ($RrfK + lexrank), CAST(0 AS DOUBLE))
           + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + vecrank), CAST(0 AS DOUBLE)) AS score
  FROM u
),
r AS (
  SELECT qid, did, lexrank, vecrank, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS INTEGER) AS rn
  FROM s
)
SELECT qid AS "QueryId", did AS doc_id,
       lexrank AS "LexRank", vecrank AS "VecRank",
       score AS "RrfScore", rn AS "Rank"
FROM r WHERE rn <= $RrfTopK
ORDER BY "QueryId", "Rank"
"""
  }

  /** PRF-expansion mirror: the first-pass mirror nested VERBATIM as
    * the feedback CTE, expansion weights as exact BIGINT
    * tf × quantized-score sums with (weight DESC, term) ranking, and
    * the second pass the SAME proven BM25 arithmetic over the expanded
    * per-query term sets. */
  val retrievalPrfExpand: String = {
    import graft.ops.RetrievalOps.PrfExpansionTerms
    val k1 = TextOps.Bm25K1
    val b = TextOps.Bm25B
    val qvals = TextOps.Bm25Queries
      .flatMap { case (qid, q) => q.split("\\s+").distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    toksCte + s""",
fb AS ($textBm25Topk),
ex AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS dl, unnest(t) AS tok FROM toks),
qterms(qid, tok) AS (VALUES $qvals),
fbtf AS (
  SELECT f."QueryId" AS qid, f."ScoreQ" AS sq, e.doc_id, e.tok,
         CAST(count(*) AS INTEGER) AS tfc
  FROM fb f JOIN ex e ON e.doc_id = f.doc_id
  GROUP BY qid, sq, e.doc_id, e.tok
),
cand AS (
  SELECT f.qid, f.tok, CAST(sum(CAST(f.tfc AS BIGINT) * f.sq) AS BIGINT) AS wt
  FROM fbtf f
  WHERE NOT EXISTS (SELECT 1 FROM qterms q WHERE q.qid = f.qid AND q.tok = f.tok)
  GROUP BY f.qid, f.tok
),
expn AS (
  SELECT qid, tok FROM (
    SELECT qid, tok,
           row_number() OVER (PARTITION BY qid ORDER BY wt DESC, tok) AS rn
    FROM cand
  ) WHERE rn <= $PrfExpansionTerms
),
allq AS (SELECT qid, tok FROM qterms UNION SELECT qid, tok FROM expn),
hit AS (
  SELECT e.doc_id, e.dl, e.tok, CAST(count(*) AS INTEGER) AS tfc
  FROM ex e JOIN (SELECT DISTINCT tok FROM allq) dt ON e.tok = dt.tok
  GROUP BY e.doc_id, e.dl, e.tok
),
dft AS (SELECT tok, CAST(count(DISTINCT doc_id) AS INTEGER) AS dfc FROM hit GROUP BY tok),
st AS (SELECT CAST(count(*) AS INTEGER) AS ndocs,
              CAST(sum(len(t)) AS BIGINT) AS sumdl FROM toks),
s2 AS (
  SELECT a.qid, h.doc_id,
         CAST(floor(
           (((ndocs - dfc + CAST(0.5 AS DOUBLE)) / (dfc + CAST(0.5 AS DOUBLE)))
            * (tfc * CAST(${k1 + 1.0} AS DOUBLE))
            / (tfc + CAST($k1 AS DOUBLE)
               * (CAST(${1.0 - b} AS DOUBLE)
                  + CAST($b AS DOUBLE) * dl / (CAST(sumdl AS DOUBLE) / ndocs))))
           * 1e9) AS BIGINT) AS sq
  FROM hit h JOIN dft USING (tok) JOIN allq a ON a.tok = h.tok CROSS JOIN st
),
g2 AS (SELECT qid, doc_id, CAST(sum(sq) AS BIGINT) AS scoreq,
              CAST(count(*) AS INTEGER) AS nhit
       FROM s2 GROUP BY qid, doc_id),
es AS (SELECT qid, array_to_string(list(tok ORDER BY tok), ',') AS expterms
       FROM expn GROUP BY qid),
r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY scoreq DESC, doc_id) AS INTEGER) AS rn
       FROM g2)
SELECT r2.qid AS "QueryId", r2.doc_id, r2.nhit AS "NTermsHit",
       r2.scoreq AS "ScoreQ", CAST(r2.scoreq AS DOUBLE) / 1e9 AS "Score",
       r2.rn AS "Rank", COALESCE(es.expterms, '') AS "ExpTerms"
FROM r2 LEFT JOIN es ON r2.qid = es.qid
WHERE r2.rn <= ${TextOps.Bm25TopK}
ORDER BY "QueryId", "Rank"
"""
  }

  /** Retrieval-quality eval mirror: relevance derived by the SAME two
    * declared standards as the engine — conjunctive term containment
    * for the lexical methods (bm25/prf/rrf), the exact brute-force
    * top-k for the ANN methods (ivf/pq/ivfpq) — with each method's own
    * mirror nested verbatim as a CTE. pq's retrieved list mirror IS
    * the exact list (its gate oracle), so its recall/precision rows
    * compute to 1.0 — the measured PQ-rerank-losslessness claim as
    * values; ivfpq reuses the ivf mirror for the same reason (the
    * route is the only lossy stage, in both engines identically). All
    * metrics are exact rationals of small integer counts. */
  val retrievalEval: String = {
    import graft.ops.RetrievalOps.RrfTopK
    import graft.ops.SimilarityOps.{DefaultK, ProbeIdMax}
    val lexQids = TextOps.Bm25Queries.map(q => s"(${q._1})").mkString(", ")
    val vecQids = (0 until ProbeIdMax).map(q => s"($q)").mkString(", ")
    val qtermVals = TextOps.Bm25Queries
      .flatMap { case (qid, q) => q.split("\\s+").distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    // one eval block per method: spine LEFT JOIN relevance counts LEFT
    // JOIN per-query hits over `cte`'s ranked list
    def block(m: String, cte: String, k: Int, spine: String,
              relCte: String, nrelCte: String,
              qidCol: String, docCol: String): String = s"""
SELECT '$m' AS "Method", s.qid AS "QueryId",
       COALESCE(n.nrel, 0) AS "NRel", CAST($k AS INTEGER) AS "K",
       COALESCE(h.hits, 0) AS "Hits",
       CASE WHEN COALESCE(n.nrel, 0) = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(COALESCE(h.hits, 0) AS DOUBLE) / n.nrel END AS "Recall",
       CAST(COALESCE(h.hits, 0) AS DOUBLE) / $k AS "Precision",
       CASE WHEN h.firstrel IS NULL THEN CAST(0 AS DOUBLE)
            ELSE CAST(1 AS DOUBLE) / h.firstrel END AS "RR"
FROM $spine s
LEFT JOIN $nrelCte n ON s.qid = n.qid
LEFT JOIN (
  SELECT t.$qidCol AS qid, CAST(count(*) AS BIGINT) AS hits,
         min(t."Rank") AS firstrel
  FROM $cte t JOIN $relCte v ON t.$qidCol = v.qid AND t.$docCol = v.doc_id
  GROUP BY 1) h ON s.qid = h.qid"""
    s"""
WITH lexq(qid) AS (VALUES $lexQids),
vecq(qid) AS (VALUES $vecQids),
qt(qid, tok) AS (VALUES $qtermVals),
dtoks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents),
dex AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM dtoks),
nqt AS (SELECT qid, count(DISTINCT tok) AS nq FROM qt GROUP BY qid),
rel AS (
  SELECT x.qid, x.doc_id FROM (
    SELECT q.qid, e.doc_id, count(DISTINCT e.tok) AS nh
    FROM dex e JOIN qt q ON e.tok = q.tok GROUP BY q.qid, e.doc_id) x
  JOIN nqt ON x.qid = nqt.qid WHERE x.nh = nqt.nq
),
nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS nrel FROM rel GROUP BY qid),
bm AS ($textBm25Topk),
pr AS ($retrievalPrfExpand),
rr AS ($retrievalHybridRrf),
vex AS ($similarityTopk),
ivf AS ($similarityIvfTopk),
vrel AS (SELECT CAST("QId" AS INTEGER) AS qid, "NId" AS doc_id FROM vex),
vnrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS nrel FROM vrel GROUP BY qid),
vexi AS (SELECT CAST("QId" AS INTEGER) AS "QueryId", "NId" AS doc_id, "Rank" FROM vex),
ivfi AS (SELECT CAST("QId" AS INTEGER) AS "QueryId", "NId" AS doc_id, "Rank" FROM ivf)
${block("bm25", "bm", TextOps.Bm25TopK, "lexq", "rel", "nrel", "\"QueryId\"", "doc_id")}
UNION ALL
${block("prf", "pr", TextOps.Bm25TopK, "lexq", "rel", "nrel", "\"QueryId\"", "doc_id")}
UNION ALL
${block("rrf", "rr", RrfTopK, "lexq", "rel", "nrel", "\"QueryId\"", "doc_id")}
UNION ALL
${block("ivf", "ivfi", DefaultK, "vecq", "vrel", "vnrel", "\"QueryId\"", "doc_id")}
UNION ALL
${block("pq", "vexi", DefaultK, "vecq", "vrel", "vnrel", "\"QueryId\"", "doc_id")}
UNION ALL
${block("ivfpq", "ivfi", DefaultK, "vecq", "vrel", "vnrel", "\"QueryId\"", "doc_id")}
ORDER BY "Method", "QueryId"
"""
  }

  /** Hierarchical (coarse-routed) semantic-dedup mirror: the same
    * fine codebook CTEs, then SimilarityOps.assignHierarchical
    * transcribed step for step — coarse Lloyd over the fine centroids
    * (seeds = fine cids < coarseK, same `//` update), fine→coarse
    * cell assignment, routing each corpus vector to its HierNProbe
    * nearest OCCUPIED coarse cells by (dist, cid), fine argmin within
    * the routed cells by (dist, fcid) — and the flat mirror's pair
    * semantics over the resulting assignment. This is an INDEPENDENT
    * mirror of the two-level route itself, not an agreement claim
    * against flat assignment: a vector whose true centroid lies
    * outside its routed cells diverges from flat in BOTH engines
    * identically (measured flat agreement at gate scale: 0.992), so
    * the gate hash checks the exact hierarchical semantics.
    * coarseK is round(√K) of the DEFAULT codebook size — the engine
    * derives it from the surviving-centroid count at runtime, so this
    * mirror assumes full seed survival (holds on this corpus; the
    * kmeans-profile oracle would go red first if it ever broke). */
  val similaritySemanticDedupHier: String = {
    import graft.ops.SimilarityOps.{DefaultNCentroids, DefaultSemDedupThreshold, HierNProbe, KmeansRounds}
    val coarseK = math.max(1, math.round(math.sqrt(DefaultNCentroids.toDouble)).toInt)
    val dot = (a: String, b: String) =>
      s"list_sum([$a.qv[i] * $b.cq[i] for i in range(1, len($a.qv)+1)])"
    val coarseRounds = (1 to KmeansRounds).map { r =>
      s""",
ha$r AS (
  SELECT vec_id AS avid, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             (v.nn - 2 * ${dot("v", "c")} + c.cn), c.cid) AS rn
    FROM fv v CROSS JOIN h${r - 1} c
  ) WHERE rn = 1
),
h${r}d AS (
  SELECT a.cid, e.dim, CAST(sum(e.v) // count(*) AS BIGINT) AS cv
  FROM fed e JOIN ha$r a ON e.vec_id = a.avid
  GROUP BY a.cid, e.dim
),
h$r AS (
  SELECT cid, list(cv ORDER BY dim) AS cq, CAST(sum(cv * cv) AS BIGINT) AS cn
  FROM h${r}d GROUP BY cid
)"""
    }.mkString
    val hFinal = s"h$KmeansRounds"
    quantCte + codebookCtes + s""",
fv AS (SELECT cid AS vec_id, cq AS qv, cn AS nn FROM $kmeansCFinal),
fed AS (
  SELECT vec_id, i AS dim, qv[i] AS v
  FROM fv CROSS JOIN range(1, 65) t(i)
),
h0 AS (SELECT vec_id AS cid, qv AS cq, nn AS cn FROM fv WHERE vec_id < $coarseK)""" +
      coarseRounds + s""",
fc AS (
  SELECT vec_id AS fcid, qv AS fq, nn AS fn, cid AS coarseid FROM (
    SELECT v.vec_id, v.qv, v.nn, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             (v.nn - 2 * ${dot("v", "c")} + c.cn), c.cid) AS rn
    FROM fv v CROSS JOIN $hFinal c
  ) WHERE rn = 1
),
occ AS (
  SELECT c.cid, c.cq, c.cn
  FROM $hFinal c JOIN (SELECT DISTINCT coarseid AS cid FROM fc) u USING (cid)
),
rt AS (
  SELECT vec_id, qv, nn, cid AS coarseid FROM (
    SELECT v.vec_id, v.qv, v.nn, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             (v.nn - 2 * ${dot("v", "c")} + c.cn), c.cid) AS rn
    FROM n v CROSS JOIN occ c
  ) WHERE rn <= $HierNProbe
),
haf AS (
  SELECT vec_id, fcid AS cid FROM (
    SELECT r2.vec_id, f.fcid,
           row_number() OVER (PARTITION BY r2.vec_id ORDER BY
             (r2.nn - 2 * list_sum([r2.qv[i] * f.fq[i] for i in range(1, len(r2.qv)+1)]) + f.fn),
             f.fcid) AS rn
    FROM rt r2 JOIN fc f ON r2.coarseid = f.coarseid
  ) WHERE rn = 1
),
hmem AS (
  SELECT h.vec_id, h.cid, v.label, v.qv, v.nn
  FROM haf h JOIN n v USING (vec_id)
),
hpr AS (
  SELECT b.vec_id AS v2, count(*) AS nd
  FROM hmem a JOIN hmem b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE CAST(list_sum([a.qv[i] * b.qv[i] for i in range(1, len(a.qv)+1)]) AS DOUBLE)
        / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) >= $DefaultSemDedupThreshold
  GROUP BY b.vec_id
)
SELECT m.vec_id, CAST(m.cid AS BIGINT) AS "Cid", m.label,
       CAST(COALESCE(p.nd, 0) AS BIGINT) AS "NDupEarlier",
       (COALESCE(p.nd, 0) > 0) AS "IsDup"
FROM hmem m LEFT JOIN hpr p ON m.vec_id = p.v2
ORDER BY m.vec_id
"""
  }

  /** Incremental embedding-dedup mirror: new arrivals (vec_id ≡ 9
    * mod 10) route to their nprobe nearest FINAL centroids, then
    * exact-cosine-verify against only the standing corpus members
    * assigned to those clusters. */
  val similarityIncrementalDedup: String = {
    import graft.ops.SimilarityOps.{DefaultNProbe, DefaultSemDedupThreshold, NewVecMod, NewVecRemainder}
    val cFinal = kmeansCFinal
    quantCte + codebookCtes + s""",
rt AS (
  SELECT qid, qp, np, cid FROM (
    SELECT p.vec_id AS qid, p.qv AS qp, p.nn AS np, c.cid,
           row_number() OVER (PARTITION BY p.vec_id ORDER BY
             (p.nn - 2 * list_sum([p.qv[i] * c.cq[i] for i in range(1, len(p.qv)+1)]) + c.cn), c.cid) AS rn
    FROM n p CROSS JOIN $cFinal c WHERE p.vec_id % $NewVecMod = $NewVecRemainder
  ) WHERE rn <= $DefaultNProbe
),
corp AS (
  SELECT a.avid AS vec_id, a.cid, v.qv, v.nn
  FROM af a JOIN n v ON a.avid = v.vec_id
  WHERE v.vec_id % $NewVecMod <> $NewVecRemainder
),
pr AS (
  SELECT rt.qid AS "NewId", corp.vec_id AS "CorpusId",
         CAST(list_sum([rt.qp[i] * corp.qv[i] for i in range(1, len(rt.qp)+1)]) AS DOUBLE)
           / (sqrt(CAST(rt.np AS DOUBLE)) * sqrt(CAST(corp.nn AS DOUBLE))) AS "Cosine"
  FROM rt JOIN corp ON rt.cid = corp.cid
)
SELECT "NewId", "CorpusId", "Cosine" FROM pr
WHERE "Cosine" >= $DefaultSemDedupThreshold
ORDER BY "NewId", "CorpusId"
"""
  }

  /** Banded sign-LSH mirror (SimilarityOps.lshNeardup defaults): plane
    * (p, i) sign = first hex digit of md5('p|i') ≥ 8; band b =
    * concatenation of its planesPerBand bits; candidates = pairs
    * agreeing on at least one whole (band_id, value). */
  val similarityLshNeardup: String = {
    val bands = graft.ops.SimilarityOps.DefaultBands
    val rpb = graft.ops.SimilarityOps.DefaultPlanesPerBand
    def bit(p: Int): String =
      s"""(CASE WHEN list_sum([CASE WHEN instr('0123456789abcdef', substr(md5('$p|' || CAST(i AS VARCHAR)), 1, 1)) - 1 >= 8
         |       THEN qv[i] ELSE -qv[i] END for i in range(1, len(qv)+1)]) >= 0 THEN '1' ELSE '0' END)""".stripMargin
    val bandCols = (1 to bands).map { b =>
      val bits = ((b - 1) * rpb + 1 to b * rpb).map(bit).mkString(" ||\n  ")
      s"$bits AS b$b"
    }.mkString(",\n  ")
    val blUnion = (1 to bands).map { b =>
      if (b == 1) s"SELECT vec_id, 1 AS band_id, b1 AS band_val FROM s"
      else s"UNION ALL SELECT vec_id, $b, b$b FROM s"
    }.mkString("\n  ")
    quantCte + s"""
, s AS (
  SELECT vec_id, label, qv, nn,
  $bandCols
  FROM n
),
bl AS (
  $blUnion
),
${coolCtes("bl", "cool", "vec_id", graft.ops.SimilarityOps.HotBucketMaxOccupancy)},
cand AS (
  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
  FROM cool a JOIN cool b ON a.band_id = b.band_id AND a.band_val = b.band_val
                          AND a.vec_id < b.vec_id
),
p AS (
  SELECT c.v1 AS "V1", c.v2 AS "V2", sa.label AS l1, sb.label AS l2,
         list_sum([sa.qv[i] * sb.qv[i] for i in range(1, len(sa.qv)+1)]) AS dot,
         sa.nn AS na, sb.nn AS nb
  FROM cand c JOIN s sa ON c.v1 = sa.vec_id JOIN s sb ON c.v2 = sb.vec_id
),
c2 AS (
  SELECT "V1", "V2",
         CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS "Cosine",
         (l1 = l2) AS "SameLabel"
  FROM p
)
SELECT "V1", "V2", "Cosine", "SameLabel" FROM c2 WHERE "Cosine" >= 0.3
ORDER BY "V1", "V2"
"""
  }

  // ---------- relational surface (rollup / set ops / as-of / regex) ----------

  val rollupCountryYear: String = CoreSql.txnCte + """
SELECT "Country", "Year",
       CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS DOUBLE) AS "TotalRevenue",
       count(DISTINCT "InvoiceNo") AS "TotalOrders",
       CAST(GROUPING("Country", "Year") AS BIGINT) AS "GroupingId"
FROM sales
GROUP BY ROLLUP("Country", "Year")
ORDER BY "GroupingId", "Country" ASC NULLS FIRST, "Year" ASC NULLS FIRST
"""

  /** Oracle for the skew-salted join is the PLAIN unsalted join — a
    * hash match proves the salting rewrite is invisible to results. */
  val skewSaltedJoin: String = CoreSql.txnCte + """
, dim AS (
  SELECT "Country", sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS crev
  FROM sales GROUP BY "Country"
), cust AS (
  SELECT s."Country", s."CustomerID",
         sum(CAST(s."TotalAmount" AS DECIMAL(18,4))) AS custrev,
         max(d.crev) AS crev
  FROM sales s JOIN dim d ON s."Country" = d."Country"
  GROUP BY s."Country", s."CustomerID"
)
SELECT "Country", "CustomerID", CAST(custrev AS DOUBLE) AS "CustRevenue",
       CAST(custrev AS DOUBLE) / CAST(crev AS DOUBLE) AS "CountryShare"
FROM cust ORDER BY "Country", "CustomerID"
"""

  /** Oracle for the sketch-then-confirm heavy hitters is the EXACT
    * heavy-hitter set — the Misra-Gries guarantee (candidates ⊇ all
    * keys ≥ φN) plus the exact confirm pass makes the sketch path
    * bit-identical to it. Integer threshold arithmetic on both sides. */
  val heavyHitters: String = CoreSql.txnCte + s"""
, tot AS (SELECT count(*) AS n FROM sales)
, cnt AS (SELECT "Country", count(*) AS c FROM sales GROUP BY "Country")
SELECT "Country", c AS "Cnt", CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS "Share"
FROM cnt, tot
WHERE c * 100 >= ${graft.ops.RelationalOps.HhPhiPct} * n
ORDER BY "Cnt" DESC, "Country"
"""

  /** Oracle for the bloom-pruned join is the PLAIN semi join — the
    * exact join after the bloom pre-filter removes every false
    * positive, so the pruning rewrite is invisible to results. */
  val bloomPrunedJoin: String = """
SELECT l_returnflag AS "ReturnFlag",
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS "Revenue",
       count(*) AS "Lines",
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS "Qty"
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
ORDER BY "ReturnFlag"
"""

  /** 48-bit big-endian integer from the first 12 hex chars of `e` —
    * DuckDB lacks base-16 string conversion, so decode per char via
    * instr (the [[graft.ops.CurateOps.hashBucket]] mirror pattern),
    * matching Spark's `conv(substring(md5, 1, 12), 16, 10)`. */
  private def hex48(e: String): String =
    (1 to 12).map { p =>
      val pow = 1L << (4 * (12 - p))
      s"(instr('0123456789abcdef', substr($e, $p, 1)) - 1) * ${pow}"
    }.mkString("(", " + ", ")")

  /** KMV mirror: the k smallest distinct 48-bit hash prefixes via
    * DISTINCT + ORDER BY + LIMIT (the oracle may shuffle every key;
    * the engine's sketch may not), then the identical one-division
    * estimate. Constants interpolated from RelationalOps so both
    * sides move together. */
  val kmvDistinct: String = {
    val k = graft.ops.RelationalOps.KmvK
    CoreSql.txnCte + s""",
keys AS (SELECT DISTINCT "InvoiceNo" AS ky FROM sales),
hs AS (SELECT ${hex48("md5(ky)")} AS v FROM keys),
bot AS (SELECT v FROM hs ORDER BY v LIMIT $k),
st AS (SELECT count(*) AS sz, max(v) AS kth FROM bot),
ex AS (SELECT count(*) AS exact FROM keys),
fin AS (
  SELECT exact AS "ExactDistinct",
         CASE WHEN sz >= $k THEN kth END AS "KthHash",
         CASE WHEN sz >= $k
              THEN CAST(${(k - 1).toDouble * 281474976710656.0} AS DOUBLE) / CAST(kth AS DOUBLE)
              ELSE CAST(sz AS DOUBLE) END AS "KmvEstimate"
  FROM st, ex
)
SELECT "ExactDistinct", "KthHash", "KmvEstimate",
       (abs("KmvEstimate" - CAST("ExactDistinct" AS DOUBLE))
          <= 0.25 * CAST("ExactDistinct" AS DOUBLE)) AS "ErrOk"
FROM fin
"""
  }

  /** Bottom-k-by-md5 sample mirror — same hash, same k, so the exact
    * same rows in the exact same order. */
  val sampleBottomK: String = s"""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS "Hash", source, n_chars
FROM documents
ORDER BY "Hash" LIMIT ${graft.ops.RelationalOps.SampleK}
"""

  /** Unpivot mirror: explicit UNION ALL branches (the portable
    * spelling of UNPIVOT — metric names must equal the Spark side's
    * source column names). */
  val unpivotCountryMetrics: String = CoreSql.txnCte + """,
c AS (
  SELECT "Country",
         CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS DOUBLE) AS rev,
         CAST(count(DISTINCT "InvoiceNo") AS DOUBLE) AS ord,
         CAST(sum("Quantity") AS DOUBLE) AS itm
  FROM sales GROUP BY "Country"
)
SELECT "Country", 'Revenue' AS "Metric", rev AS "Value" FROM c
UNION ALL SELECT "Country", 'Orders', ord FROM c
UNION ALL SELECT "Country", 'Items', itm FROM c
ORDER BY "Country", "Metric"
"""

  /** Session-window mirror: the gaps-and-islands decomposition (lag →
    * new-session flag → prefix-sum island id → per-island aggregate).
    * Boundary semantics follow Spark's half-open [start, last+gap)
    * session: a gap of EXACTLY the threshold starts a new session
    * (`>=`, not `>`), because the next event's window start equals
    * the previous session's end and half-open intervals at equal
    * endpoints do not overlap. */
  val sessionWindows: String = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
l AS (
  SELECT user_id, us, value,
         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM e
),
s AS (
  SELECT user_id, us, value,
         sum(ns) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
)
SELECT user_id,
       min(us) AS "StartUs",
       max(us) + 1800000000 AS "EndUs",
       count(*) AS "NEvents",
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "ValueSum"
FROM s GROUP BY user_id, sid ORDER BY user_id, "StartUs"
"""

  /** Interval-join mirror: the same window constant as the Spark side
    * ([[graft.ops.EventsOps.FunnelWindowHours]]), instants as
    * epoch_us integers — every lag statistic is exact integer math. */
  val clickAttribution: String = {
    val winUs = graft.ops.EventsOps.FunnelWindowHours * 3600L * 1000000L
    s"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, us AS vus FROM e WHERE event_type = 'view'),
c AS (SELECT user_id, us AS cus FROM e WHERE event_type = 'click')
SELECT v.user_id,
       count(*) AS "Pairs",
       min(cus - vus) AS "MinLagUs",
       max(cus - vus) AS "MaxLagUs",
       CAST(sum(cus - vus) AS BIGINT) AS "SumLagUs"
FROM v JOIN c ON v.user_id = c.user_id
              AND cus > vus AND cus <= vus + $winUs
GROUP BY v.user_id ORDER BY v.user_id
"""
  }

  /** Oracle for the incrementally-maintained daily aggregate is the
    * FROM-SCRATCH aggregate over all facts: build(history) +
    * merge(batch) must be indistinguishable from never having split
    * the corpus (exact decimal sums re-aggregate associatively). */
  val aggIncrementalDaily: String = CoreSql.txnCte + """
SELECT "Date",
       CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS DOUBLE) AS "Revenue",
       CAST(sum("Quantity") AS BIGINT) AS "Items",
       count(*) AS "Lines"
FROM sales GROUP BY "Date" ORDER BY "Date"
"""

  /** Gap-fill mirror: DuckDB `generate_series` densifies the corpus
    * calendar and `LAST_VALUE ... IGNORE NULLS` is the ANSI spelling
    * of the running forward fill; revenue stays an exact decimal sum
    * until the final DOUBLE cast on both sides. */
  val gapfillDaily: String = CoreSql.txnCte + """,
top1 AS (
  SELECT "StockCode" FROM sales GROUP BY "StockCode"
  ORDER BY sum(CAST("TotalAmount" AS DECIMAL(18,4))) DESC, "StockCode" LIMIT 1
),
pd AS (
  SELECT "Date", sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS rev
  FROM sales JOIN top1 USING ("StockCode") GROUP BY "Date"
),
ext AS (SELECT min("Date") AS mn, max("Date") AS mx FROM sales),
cal AS (
  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                     CAST(mx AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM ext
)
SELECT d AS "Date",
       (pd."Date" IS NOT NULL) AS "Observed",
       CAST(rev AS DOUBLE) AS "Revenue",
       CAST(last_value(rev IGNORE NULLS) OVER w AS DOUBLE) AS "FilledRevenue",
       CAST(sum(coalesce(rev, 0)) OVER w AS DOUBLE) AS "CumRevenue",
       CAST(datediff('day',
              last_value(CASE WHEN pd."Date" IS NOT NULL THEN d END IGNORE NULLS) OVER w,
              d) AS INTEGER) AS "DaysSinceSale"
FROM cal LEFT JOIN pd ON pd."Date" = cal.d
WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY "Date"
"""

  /** One UNION ALL branch of the [[profileTable]] oracle. */
  private def profCol(name: String, kind: String): String = {
    val mnmx = kind match {
      case "num" =>
        s"""CAST(min($name) AS DOUBLE) AS "MinNum", CAST(max($name) AS DOUBLE) AS "MaxNum", CAST(NULL AS VARCHAR) AS "MinStr", CAST(NULL AS VARCHAR) AS "MaxStr""""
      case "str" =>
        s"""CAST(NULL AS DOUBLE) AS "MinNum", CAST(NULL AS DOUBLE) AS "MaxNum", min($name) AS "MinStr", max($name) AS "MaxStr""""
      case "date" =>
        s"""CAST(NULL AS DOUBLE) AS "MinNum", CAST(NULL AS DOUBLE) AS "MaxNum", CAST(CAST(min($name) AS DATE) AS VARCHAR) AS "MinStr", CAST(CAST(max($name) AS DATE) AS VARCHAR) AS "MaxStr""""
    }
    s"""  SELECT '$name' AS "ColName", count(*) AS "RowCnt", count(*) - count($name) AS "NullCnt", count(DISTINCT $name) AS "DistinctCnt", $mnmx FROM lineitem"""
  }

  val profileTable: String = Seq(
    profCol("l_orderkey", "num"), profCol("l_quantity", "num"),
    profCol("l_extendedprice", "num"), profCol("l_discount", "num"),
    profCol("l_returnflag", "str"), profCol("l_shipdate", "date"))
    .mkString("WITH p AS (\n", "\n  UNION ALL\n", "\n)\nSELECT * FROM p ORDER BY \"ColName\"")

  val cubeCountryYear: String = CoreSql.txnCte + """
SELECT "Country", "Year",
       CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS DOUBLE) AS "TotalRevenue",
       count(DISTINCT "InvoiceNo") AS "TotalOrders",
       CAST(GROUPING("Country", "Year") AS BIGINT) AS "GroupingId"
FROM sales
GROUP BY CUBE("Country", "Year")
ORDER BY "GroupingId", "Country" ASC NULLS FIRST, "Year" ASC NULLS FIRST
"""

  val groupingSetsCountryYear: String = CoreSql.txnCte + """
SELECT "Country", "Year",
       CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS DOUBLE) AS "TotalRevenue",
       CAST(GROUPING("Country", "Year") AS BIGINT) AS "GroupingId"
FROM sales
GROUP BY GROUPING SETS (("Country"), ("Year"), ())
ORDER BY "GroupingId", "Country" ASC NULLS FIRST, "Year" ASC NULLS FIRST
"""

  val windowDailyRanks: String = CoreSql.txnCte + """
, daily AS (
  SELECT "Date", sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS "RevDec"
  FROM sales GROUP BY "Date"
)
SELECT "Date", CAST("RevDec" AS DOUBLE) AS "Revenue",
       percent_rank() OVER (ORDER BY "RevDec") AS "PctRank",
       cume_dist() OVER (ORDER BY "RevDec") AS "CumeDist"
FROM daily ORDER BY "Date"
"""

  val churnedCustomers: String = """
SELECT o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
) t ORDER BY o_custkey
"""

  val returningCustomers: String = """
SELECT o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
) t ORDER BY o_custkey
"""

  /** Pivot mirror: conditional decimal sums per declared year. */
  val pivotCountryYear: String = {
    val cols = (1995 to 2001).map { y =>
      s"""CAST(sum(CASE WHEN "Year" = $y THEN CAST("TotalAmount" AS DECIMAL(18,4)) END) AS DOUBLE) AS "Rev$y""""
    }.mkString(",\n       ")
    CoreSql.txnCte + s"""
SELECT "Country",
       $cols
FROM sales GROUP BY "Country" ORDER BY "Country"
"""
  }

  val purchaseAsofView: String = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
  FROM events
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS "PurchaseTs",
       strftime(last_view, '%Y-%m-%d %H:%M:%S') AS "LastViewTs",
       date_diff('microseconds', last_view, ts) AS "GapMicros"
FROM e WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""

  /** The as-of JOIN mirror uses DuckDB's NATIVE ASOF LEFT JOIN — an
    * independent implementation of the operator the Spark side
    * composes from a union-tag running window. */
  val asofJoinHourly: String = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
h AS (
  SELECT (us - us % 3600000000) AS hour_us, count(*) AS nv
  FROM e WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       strftime(make_timestamp(p.us), '%Y-%m-%d %H:%M:%S') AS "PurchaseTs",
       strftime(make_timestamp(h.hour_us), '%Y-%m-%d %H:%M:%S') AS "AsofHour",
       h.nv AS "NViews"
FROM p ASOF LEFT JOIN h ON p.us >= h.hour_us
ORDER BY p.event_id
"""

  val regexTokens: String = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS "NAlpha",
       CAST(len(regexp_extract_all(text, '[^ ]+')) AS INTEGER) AS "NNonSpace"
FROM documents ORDER BY doc_id
"""

  /** Sketch aggregates: the oracle recomputes the EXACT columns and
    * states the sketch error-bound booleans as literal TRUE — if a
    * Spark-side sketch drifts out of its documented bound the boolean
    * flips and the row hash-mismatches (see RelationalOps scaladoc). */
  val approxSketchStats: String = CoreSql.txnCte + """
SELECT "Country",
       count(DISTINCT "CustomerID") AS "ExactCustomers",
       count(DISTINCT "InvoiceNo") AS "ExactOrders",
       TRUE AS "CustomersSketchOk",
       TRUE AS "OrdersSketchOk",
       TRUE AS "P50SketchOk",
       TRUE AS "P90SketchOk"
FROM sales GROUP BY "Country" ORDER BY "Country"
"""

  // ---------- multimodal ----------

  /** Frame-sampling mirror (ASCII corpus ⇒ string substr == binary
    * slice); constants shared with MultimodalOps. */
  /** aHash near-dup mirror: identical 64 evenly-spaced byte samples,
    * identical floor-mean threshold, identical band-wise hash (no
    * engine shifts into a BIGINT sign bit), identical hot-capped
    * band-bucket candidate join and XOR/bit_count verify. */
  val multimodalAhashNeardup: String = {
    val mm = graft.ops.MultimodalOps
    s"""
WITH smp AS (
  SELECT doc_id,
         [ascii(substr(text, (i * length(text)) // 64 + 1, 1))
          for i in generate_series(0, 63)] AS s
  FROM documents
),
hb AS (SELECT doc_id, s, list_sum(s) // 64 AS m FROM smp),
bands AS (
  SELECT doc_id,
         [list_sum([CASE WHEN s[${mm.AhashBandBits} * b + j + 1] > m THEN 1 << j ELSE 0 END
                    for j in generate_series(0, ${mm.AhashBandBits - 1})])
          for b in generate_series(0, ${mm.AhashBands - 1})] AS bv
  FROM hb
),
bx AS (SELECT doc_id, unnest(generate_series(0, ${mm.AhashBands - 1})) AS b,
              unnest(bv) AS v
       FROM bands),
cool AS (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, v) AS bs FROM bx)
  WHERE bs <= ${mm.AhashBucketCap}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, c.doc_id AS idb
  FROM cool a JOIN cool c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
),
pairs AS (
  SELECT ida, idb,
         CAST(${(1 to mm.AhashBands)
           .map(i => s"bit_count(xor(CAST(ha.bv[$i] AS BIGINT), CAST(hz.bv[$i] AS BIGINT)))")
           .mkString("\n            + ")}
           AS INTEGER) AS hamming
  FROM cand JOIN bands ha ON ha.doc_id = ida JOIN bands hz ON hz.doc_id = idb
)
SELECT ida AS "IdA", idb AS "IdB", hamming AS "Hamming"
FROM pairs WHERE hamming <= ${mm.AhashMaxHamming}
ORDER BY "IdA", "IdB"
"""
  }

  /** pHash mirror: identical 64-byte proxy samples, the SAME driver-
    * rounded integer DCT basis literals (parity by construction),
    * identical median-of-63 threshold, band layout, hot-bucket cap
    * and Hamming verify. */
  val multimodalPhashNeardup: String = {
    val mm = graft.ops.MultimodalOps
    val cl = mm.PhashDctBasis.mkString("[", ", ", "]")
    s"""
WITH cb AS (SELECT $cl AS c),
smp AS (
  SELECT doc_id,
         [ascii(substr(text, (i * length(text)) // 64 + 1, 1))
          for i in generate_series(0, 63)] AS s
  FROM documents
),
dct AS (
  SELECT doc_id,
         [list_sum([CAST(c[(k // 8) * 8 + (m // 8) + 1] AS BIGINT)
                    * c[(k % 8) * 8 + (m % 8) + 1]
                    * s[m + 1]
                    for m in generate_series(0, 63)])
          for k in generate_series(0, 63)] AS t
  FROM smp CROSS JOIN cb
),
md AS (SELECT doc_id, t, list_sort(t[2:64])[32] AS med FROM dct),
bands AS (
  SELECT doc_id,
         [list_sum([CASE WHEN ${mm.AhashBandBits} * b + j + 1 <= 63
                          AND t[${mm.AhashBandBits} * b + j + 2] > med
                         THEN 1 << j ELSE 0 END
                    for j in generate_series(0, ${mm.AhashBandBits - 1})])
          for b in generate_series(0, ${mm.AhashBands - 1})] AS bv
  FROM md
),
bx AS (SELECT doc_id, unnest(generate_series(0, ${mm.AhashBands - 1})) AS b,
              unnest(bv) AS v
       FROM bands),
cool AS (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, v) AS bs FROM bx)
  WHERE bs <= ${mm.AhashBucketCap}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, c.doc_id AS idb
  FROM cool a JOIN cool c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
),
pairs AS (
  SELECT ida, idb,
         CAST(${(1 to mm.AhashBands)
           .map(i => s"bit_count(xor(CAST(ha.bv[$i] AS BIGINT), CAST(hz.bv[$i] AS BIGINT)))")
           .mkString("\n            + ")}
           AS INTEGER) AS hamming
  FROM cand JOIN bands ha ON ha.doc_id = ida JOIN bands hz ON hz.doc_id = idb
)
SELECT ida AS "IdA", idb AS "IdB", hamming AS "Hamming",
       (hamming <= ${mm.PhashMaxHamming}) AS "IsClose"
FROM pairs
ORDER BY "IdA", "IdB"
"""
  }

  val multimodalFrameSample: String = {
    import graft.ops.MultimodalOps.{FrameBytes, FrameStride}
    s"""
WITH fr AS (
  SELECT doc_id, text,
         unnest(range(0, (strlen(text) - 1) // $FrameBytes + 1, $FrameStride)) AS i
  FROM documents
)
SELECT doc_id,
       CAST(i AS INTEGER) AS "FrameIdx",
       md5(substr(text, CAST(i AS INTEGER) * $FrameBytes + 1, $FrameBytes)) AS "FrameMd5"
FROM fr ORDER BY doc_id, "FrameIdx"
"""
  }

  /** Byte-feature mirror: exact integer statistics over the payload
    * bytes (ord per char — ASCII corpus ⇒ byte == char code). */
  val multimodalFeatures: String = """
WITH f AS (
  SELECT doc_id,
         CAST(strlen(text) AS INTEGER) AS "NBytes",
         [ord(substr(text, i, 1)) for i in range(1, strlen(text) + 1)] AS codes
  FROM documents
)
SELECT doc_id, "NBytes",
       CAST(list_min(codes) AS INTEGER) AS "MinByte",
       CAST(list_max(codes) AS INTEGER) AS "MaxByte",
       CAST(list_sum(codes) AS BIGINT) AS "SumBytes",
       CAST(list_sum(codes) AS DOUBLE) / "NBytes" AS "MeanByte"
FROM f ORDER BY doc_id
"""

  /** Resize mirror: every factor-th char (ASCII corpus ⇒ byte ==
    * char), then the stub width formula on the resized size. */
  val multimodalResize: String = {
    val f = graft.ops.MultimodalOps.ResizeFactor
    s"""
WITH r AS (
  SELECT doc_id,
         array_to_string([substr(text, i, 1) for i in range(1, strlen(text) + 1) if (i - 1) % $f = 0], '') AS resized
  FROM documents
)
SELECT doc_id,
       CAST(strlen(resized) AS INTEGER) AS "NBytesResized",
       md5(resized) AS "ResizedMd5",
       CAST((strlen(resized) % 317) + 1 AS INTEGER) AS "FakeWidthResized"
FROM r ORDER BY doc_id
"""
  }

  val multimodalMeta: String = """
WITH m AS (
  SELECT doc_id,
         CAST(strlen(text) AS INTEGER) AS "NBytes",
         ascii(substr(text, 1, 1)) AS "FirstByte"
  FROM documents
)
SELECT doc_id, "NBytes", "FirstByte",
       ("NBytes" % 317) + 1 AS "FakeWidth",
       (("FirstByte" * 7) % 97) + 1 AS "FakeHeight",
       CAST(("NBytes" % 317) + 1 AS DOUBLE) / ((("FirstByte" * 7) % 97) + 1) AS "AspectRatio"
FROM m ORDER BY doc_id
"""
}
