"""DuckDB oracle SQL for every oracle-checkable query in queries.py.

Mirrors the float discipline documented there: decimal-exact sums,
raw IEEE per-row arithmetic, round(...,6) transcendentals, floor-epoch
BIGINT timestamps.  Tables are pre-registered views over the same
parquet files the Spark side reads.
"""

DSUM = "CAST(SUM(CAST({x} AS DECIMAL(27,6))) AS DOUBLE)"


def _dsum(x: str) -> str:
    return DSUM.format(x=x)


NORM_TEXT = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

_STOPWORDS = ["the", "and", "of", "to", "in", "is", "it", "that", "for", "on"]
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "es", "una", "que"],
}


def _marker_score(words) -> str:
    return " + ".join(
        rf"len(regexp_extract_all(lower(text), '\b{w}\b'))" for w in words
    )


def _lang_case() -> str:
    langs = sorted(_LANG_MARKERS)
    scores = {l: f"s_{l}" for l in langs}
    best = f"greatest({', '.join(scores.values())})"
    whens = " ".join(f"WHEN s_{l} = best THEN '{l}'" for l in langs)
    return f"CASE WHEN best <= 0 THEN 'und' {whens} ELSE 'und' END"


ORACLES: dict[str, str] = {}

ORACLES["flagship_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
  {_dsum('l_quantity')} AS sum_qty,
  {_dsum('l_extendedprice')} AS sum_base_price,
  {_dsum('l_extendedprice*(1-l_discount)')} AS sum_disc_price,
  {_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)')} AS sum_charge,
  COUNT(*) AS count_order,
  {_dsum('l_quantity')} / COUNT(*) AS avg_qty,
  {_dsum('l_extendedprice')} / COUNT(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["map_net_price"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice*(1-l_discount) AS net_price
FROM lineitem
"""

ORACLES["filter_pushdown"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem WHERE l_quantity >= 45 AND l_discount <= 0.02
"""

ORACLES["take_ordered"] = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 500
"""

ORACLES["drop_skip"] = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey OFFSET 1000
"""

ORACLES["takewhile_error"] = """
WITH c AS (
  SELECT min(event_id) AS cut FROM events WHERE event_id % 5000 = 4999
)
SELECT event_id, event_type, value FROM events, c
WHERE c.cut IS NULL OR event_id < c.cut
"""

ORACLES["concat_ordered"] = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '5-LOW'
"""

ORACLES["merge_interleave"] = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 100000
UNION ALL
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 100000
"""

ORACLES["cartesian_ap"] = """
SELECT r_name || '_' || n_name AS pair FROM region CROSS JOIN nation
"""

ORACLES["flatmap_words"] = f"""
SELECT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS word FROM documents
"""

ORACLES["numeric_source_math"] = """
SELECT l_orderkey, l_linenumber,
  sqrt(l_quantity) AS sqrt_qty,
  round(exp(l_discount), 6) AS exp_disc,
  round(ln(1.0 + l_discount), 6) AS ln1p_disc,
  round(sin(l_quantity), 6) AS sin_qty,
  abs(-l_tax) + 0.0 AS abs_tax
FROM lineitem
"""

ORACLES["floating_named_math"] = """
SELECT l_orderkey, l_linenumber,
  round(asin(l_discount), 6) AS asin_disc,
  round(acos(l_discount), 6) AS acos_disc,
  round(atan(l_quantity), 6) AS atan_qty,
  -- DuckDB 1.0 has no hyperbolics: exp-based identities, same doubles
  -- to well past the 6-dp round for these domains
  round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sinh_disc,
  round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS cosh_disc,
  round((exp(2 * l_quantity) - 1) / (exp(2 * l_quantity) + 1), 6) AS tanh_qty,
  round(0.5 * ln((1 + l_discount) / (1 - l_discount)), 6) AS atanh_disc,
  round(ln(1.0 + l_quantity) / ln(2), 6) AS log2_qty1p
FROM lineitem
"""

ORACLES["dynamic_channel_route"] = """
SELECT event_id,
  CASE event_type
    WHEN 'purchase' THEN value * 2.0
    WHEN 'view' THEN value + 1.0
    ELSE -value
  END AS routed
FROM events
"""

ORACLES["fold_global"] = f"""
SELECT COUNT(*) AS n_rows,
  {_dsum('l_quantity')} AS total_qty,
  min(l_shipdate) AS min_ship,
  max(l_shipdate) AS max_ship,
  COUNT(DISTINCT l_suppkey) AS n_supp
FROM lineitem
"""

ORACLES["running_user_sum"] = """
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER
    (PARTITION BY user_id ORDER BY event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
FROM events
"""

ORACLES["running_user_avg"] = """
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
    / (COUNT(*) OVER w) AS run_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLES["mapm_pandas_upper"] = """
SELECT doc_id, upper(substr(text, 1, 30)) AS head FROM documents
"""

ORACLES["each_literal_map"] = """
SELECT (r.range + 1) * 2 AS value FROM range(10) r
"""

ORACLES["every_nullable"] = """
SELECT r.range + 1 AS value FROM range(5) r
UNION ALL SELECT NULL
"""

ORACLES["join_broadcast_parts"] = f"""
SELECT p_brand,
  COUNT(*) AS n_items,
  {_dsum('l_quantity')} AS sum_qty,
  {_dsum('l_extendedprice*(1-l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

ORACLES["q3_shipping_priority"] = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {_dsum('l_extendedprice*(1-l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""

ORACLES["q5_nation_revenue"] = f"""
SELECT n_name,
  {_dsum('l_extendedprice*(1-l_discount)')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""

ORACLES["asof_purchase"] = """
SELECT l.event_id, l.user_id, l.value,
  (SELECT r.value FROM events r
   WHERE r.event_type = 'purchase' AND r.user_id = l.user_id AND r.ts <= l.ts
   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS last_purchase_value
FROM events l WHERE l.event_type = 'view'
"""

ORACLES["latest_event_per_user"] = """
SELECT user_id, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

ORACLES["topn_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, o_totalprice,
  CAST(row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
FROM orders
QUALIFY rn <= 3
"""

ORACLES["tumbling_hourly"] = f"""
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
  COUNT(*) AS window_count,
  {_dsum('value')} AS window_sum
FROM events GROUP BY 1
"""

ORACLES["sliding_10m"] = f"""
SELECT CAST(floor(epoch(ts)/300)*300 - t.off AS BIGINT) AS window_start,
  COUNT(*) AS window_count,
  {_dsum('value')} AS window_sum
FROM events CROSS JOIN (VALUES (0), (300)) t(off)
GROUP BY 1
"""

ORACLES["session_30m"] = f"""
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
  CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS session_end,
  COUNT(*) AS n_events,
  {_dsum('value')} AS sum_value
FROM numbered GROUP BY user_id, sid
"""

# Quotas mirror the Spark float discipline: per-source weight rounded
# to 6dp then DECIMAL-summed (order-independent), one IEEE ratio, floor.
ORACLES["temperature_mixture_sample"] = """
WITH c AS (
  SELECT source, COUNT(*) AS n_s,
    CAST(round(pow(CAST(COUNT(*) AS DOUBLE), 0.7), 6) AS DECIMAL(27,6)) AS w
  FROM documents GROUP BY source
), s AS (
  SELECT SUM(w) AS sw FROM c
), q AS (
  SELECT source, n_s,
    CAST(floor(
      CAST((SELECT COUNT(*) // 5 FROM documents) AS DOUBLE)
      * CAST(w AS DOUBLE) / CAST((SELECT sw FROM s) AS DOUBLE)
    ) AS BIGINT) AS quota
  FROM c
), r AS (
  SELECT source, doc_id,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS BIGINT) AS rk
  FROM documents
)
SELECT r.source, r.doc_id, r.rk, q.n_s, q.quota
FROM r JOIN q USING (source)
WHERE r.rk <= q.quota
"""


# Merged-interval (dynamic-gap) sessions via the islands construction:
# an event opens a new session exactly when it starts at or after the
# running max end (ts + its own gap) of every predecessor in its key.
ORACLES["session_dynamic_gap"] = f"""
WITH g AS (
  SELECT user_id, ts, value, epoch_us(ts) AS ts_us,
    epoch_us(ts) + (CASE event_type WHEN 'purchase' THEN 30
                                    WHEN 'signup' THEN 60
                                    WHEN 'error' THEN 5
                                    ELSE 10 END) * CAST(60000000 AS BIGINT) AS end_us
  FROM events
), marked AS (
  SELECT *, CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > ts_us
                 THEN 0 ELSE 1 END AS new_s
  FROM g
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
  CAST(floor(min(ts_us) / 1000000) AS BIGINT) AS session_start,
  CAST(floor(max(end_us) / 1000000) AS BIGINT) AS session_end,
  COUNT(*) AS n_events,
  {_dsum('value')} AS sum_value
FROM numbered GROUP BY user_id, sid
"""

ORACLES["streaming_session_dynamic"] = ORACLES["session_dynamic_gap"]


ORACLES["distinct_segments"] = "SELECT DISTINCT c_mktsegment FROM customer"

ORACLES["topk_orders"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""

ORACLES["customers_without_orders"] = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""

ORACLES["customers_with_orders"] = """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""

ORACLES["pivot_event_counts"] = """
SELECT user_id,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY user_id
"""

ORACLES["rollup_flag_status"] = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["json_extract_props"] = """
SELECT CAST(props->>'k' AS INTEGER) AS k, COUNT(*) AS n
FROM events GROUP BY 1
"""

ORACLES["route_choose_counts"] = f"""
SELECT CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS branch,
  COUNT(*) AS n, {_dsum('value')} AS sum_value
FROM events GROUP BY 1
"""

ORACLES["divide_parts"] = """
SELECT 'time' AS part, event_id, CAST(CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE) AS payload FROM events
UNION ALL
SELECT 'value' AS part, event_id, value AS payload FROM events
"""

ORACLES["text_token_counts"] = r"""
SELECT doc_id,
  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_words
FROM documents
"""

_sw_hits = " + ".join(
    rf"len(regexp_extract_all(lower(text), '\b{w}\b'))" for w in _STOPWORDS
)
ORACLES["text_quality"] = f"""
WITH t AS (
  SELECT doc_id,
    length(text) AS nc,
    len(regexp_extract_all(text, '[A-Za-z]')) AS na,
    len(regexp_extract_all(text, '[^\\w\\s]')) AS np,
    len(string_split_regex(trim(text), '\\s+')) AS tk,
    {_sw_hits} AS sh
  FROM documents
)
SELECT doc_id,
  round(
    0.3 * (CASE WHEN nc >= 50 AND nc <= 20000 THEN 1.0 ELSE 0.3 END)
    + 0.3 * least((na / greatest(nc, 1)) * 1.25, 1.0)
    + 0.25 * least((sh / greatest(tk, 1)) * 4.0, 1.0)
    + 0.15 * (CASE WHEN (np / greatest(tk, 1)) <= 0.5 THEN 1.0 ELSE 0.2 END)
  , 6) AS quality
FROM t
"""

_lang_scores = ",\n    ".join(
    f"{_marker_score(ws)} AS s_{l}" for l, ws in sorted(_LANG_MARKERS.items())
)
ORACLES["text_langid"] = f"""
WITH t AS (
  SELECT doc_id, lang,
    {_lang_scores}
  FROM documents
), m AS (
  SELECT *, greatest(s_de, s_en, s_es, s_fr) AS best FROM t
)
SELECT doc_id, lang, {_lang_case()} AS lang_pred FROM m
"""

ORACLES["text_fingerprint"] = f"""
SELECT doc_id, md5({NORM_TEXT}) AS fp FROM documents
"""

ORACLES["dedup_exact_docs"] = f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents GROUP BY {NORM_TEXT}
)
"""

_SHINGLES = f"""
list_transform(
  range(1, greatest(len(string_split({NORM_TEXT}, ' ')) - 2, 1) + 1),
  i -> array_to_string(list_slice(string_split({NORM_TEXT}, ' '), i, i + 2), ' ')
)
"""
ORACLES["jaccard_near_dup_pairs"] = f"""
WITH sh AS (
  SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents
), sized AS (
  SELECT doc_id, s, len(s) AS n FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  len(list_intersect(a.s, b.s)) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sized a JOIN sized b
  ON a.doc_id < b.doc_id AND a.n <= 2*b.n AND b.n <= 2*a.n
WHERE len(list_intersect(a.s, b.s)) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
"""

_DOT = "list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce[i]::DOUBLE))"
_QNORM = "sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))"
_CNORM = "sqrt(list_sum(list_transform(range(1, 65), i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))"
ORACLES["knn_bruteforce"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
    round({_DOT} / ({_QNORM} * {_CNORM}), 6) AS cos_sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cos_sim,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
FROM s
QUALIFY rank <= 10
"""

# ---------------------------------------------------------------------------
# TPC-H-shape battery
# ---------------------------------------------------------------------------

ORACLES["q6_forecast_revenue"] = f"""
SELECT {_dsum('l_extendedprice*l_discount')} AS revenue, COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24
"""

ORACLES["q4_priority_exists"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

ORACLES["q12_line_priority"] = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""

ORACLES["q14_promo_revenue"] = f"""
SELECT round(
  100.0 * {_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")}
        / {_dsum('l_extendedprice*(1-l_discount)')}, 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""

ORACLES["q10_returned_revenue"] = f"""
SELECT c_custkey, c_name, {_dsum('l_extendedprice*(1-l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["q15_top_supplier"] = """
WITH per_supp AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(27,6))) AS rev_exact
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
), ranked AS (
  SELECT *, rank() OVER (ORDER BY rev_exact DESC) AS rnk FROM per_supp
)
SELECT s_suppkey, s_name, CAST(rev_exact AS DOUBLE) AS total_revenue
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rnk = 1
"""

ORACLES["q17_small_qty_revenue"] = f"""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey, AVG(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {_dsum('l_extendedprice')} / 7.0 AS avg_yearly, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN avg_qty ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
"""

ORACLES["q18_large_orders"] = f"""
WITH big AS (
  SELECT l_orderkey, {_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {_dsum('l_quantity')} > 120
)
SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
"""

ORACLES["q19_disjunctive"] = f"""
SELECT {_dsum('l_extendedprice*(1-l_discount)')} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_type = 'PROMO' AND p_size <= 50 AND l_quantity >= 20)
"""

ORACLES["q22_idle_customers"] = f"""
WITH ab AS (SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, COUNT(*) AS numcust, {_dsum('c_acctbal')} AS totacctbal
FROM customer, ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""

ORACLES["q7_nation_volume"] = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_dsum('l_extendedprice*(1-l_discount)')} AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name != cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""

ORACLES["orders_by_month"] = f"""
SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
       COUNT(*) AS n_orders, {_dsum('o_totalprice')} AS month_total
FROM orders GROUP BY 1, 2
"""

ORACLES["string_funcs_parts"] = """
SELECT p_partkey,
  upper(p_name) AS uname,
  length(p_name) AS name_len,
  substr(p_name, 1, 5) AS prefix5,
  concat_ws('/', p_brand, p_type) AS brand_type,
  levenshtein(p_name, 'red widget') AS lev_widget,
  replace(p_name, ' ', '_') AS snake_name
FROM part
"""

ORACLES["orders_above_cust_avg"] = """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (PARTITION BY o_custkey) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, round(cust_avg, 6) AS cust_avg
FROM w WHERE o_totalprice > cust_avg
"""

# ---------------------------------------------------------------------------
# Text / multimodal extensions
# ---------------------------------------------------------------------------

ORACLES["text_tfidf_top_terms"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term
), doclen AS (
  SELECT doc_id, COUNT(*) AS len FROM words GROUP BY doc_id
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
    round((CAST(tf.tf AS DOUBLE) / doclen.len)
          * ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (df.df + 1.0)), 6) AS tfidf
  FROM tf JOIN doclen ON tf.doc_id = doclen.doc_id
          JOIN df ON tf.term = df.term
          CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
"""

ORACLES["multimodal_bytes_stats"] = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
  length(base64(encode(text))) AS b64_len
FROM documents
"""

ORACLES["rollup_hour_day_week"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(27,6))) AS total
  FROM events GROUP BY 1
), daily AS (
  SELECT date_trunc('day', bucket) AS bucket, SUM(n) AS n, SUM(total) AS total
  FROM hourly GROUP BY 1
), weekly AS (
  SELECT date_trunc('week', bucket) AS bucket, SUM(n) AS n, SUM(total) AS total
  FROM daily GROUP BY 1
)
SELECT 'hour' AS level, CAST(floor(epoch(bucket)) AS BIGINT) AS bucket_start, CAST(n AS BIGINT) AS n, CAST(total AS DOUBLE) AS total FROM hourly
UNION ALL
SELECT 'day', CAST(floor(epoch(bucket)) AS BIGINT), CAST(n AS BIGINT), CAST(total AS DOUBLE) FROM daily
UNION ALL
SELECT 'week', CAST(floor(epoch(bucket)) AS BIGINT), CAST(n AS BIGINT), CAST(total AS DOUBLE) FROM weekly
"""

ORACLES["interval_join_views_purchases"] = """
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
       v.user_id, p.value AS purchase_value
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts - INTERVAL 1 HOUR
 AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
"""

ORACLES["quantiles_by_priority"] = """
SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
  COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
"""

ORACLES["q8_market_share"] = """
WITH j AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6)) AS vol,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
)
SELECT o_year,
  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_0' THEN vol ELSE CAST(0 AS DECIMAL(27,6)) END)
        / SUM(vol) AS DOUBLE), 6) AS mkt_share,
  CAST(SUM(vol) AS DOUBLE) AS total_volume
FROM j GROUP BY o_year
"""

ORACLES["q13_cust_order_distribution"] = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count
"""

ORACLES["lag_user_value_delta"] = """
SELECT event_id, user_id,
  value - lag(value) OVER w AS value_delta,
  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS secs_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLES["cube_priority_status"] = """
SELECT o_orderpriority, o_orderstatus,
  GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""

ORACLES["viewers_never_purchased"] = """
SELECT user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
EXCEPT ALL
SELECT user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
"""

# r11 (VERDICT-r10 #4): the global ntile(4) became three broadcast
# percentile thresholds — quantile_cont is DuckDB's exact twin of
# Spark F.percentile, and the strict > comparisons keep interpolated
# cuts from flipping a row cross-engine (fractions are exactly
# 0/.25/.5/.75, so both engines' thresholds sit strictly between the
# same adjacent 2-decimal balances).
ORACLES["ntile_acctbal_quartiles"] = """
WITH b AS (
  SELECT quantile_cont(c_acctbal, 0.25) AS t1,
         quantile_cont(c_acctbal, 0.5)  AS t2,
         quantile_cont(c_acctbal, 0.75) AS t3
  FROM customer
), q AS (
  SELECT c_mktsegment, c_acctbal,
         CAST(1 + CAST(c_acctbal > t1 AS INT)
                + CAST(c_acctbal > t2 AS INT)
                + CAST(c_acctbal > t3 AS INT) AS BIGINT) AS quartile
  FROM customer, b
)
SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
       round(AVG(c_acctbal), 6) AS avg_bal
FROM q GROUP BY c_mktsegment, quartile
"""

# streaming twin — identical oracle to the batch tumbling_hourly
ORACLES["streaming_tumbling_hourly"] = ORACLES["tumbling_hourly"]

ORACLES["streaming_takewhile_prefix"] = """
SELECT event_id, value FROM events WHERE event_id < 600
"""

ORACLES["dropwhile_prefix"] = """
WITH c AS (
  SELECT min(o_orderkey) AS cut FROM orders WHERE NOT (o_totalprice < 150000)
)
SELECT o_orderkey, o_totalprice FROM orders, c
WHERE c.cut IS NOT NULL AND o_orderkey >= c.cut
"""

ORACLES["streaming_resumable_fold"] = """
SELECT user_id,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS total_millis,
  COUNT(*) AS n_events
FROM events GROUP BY user_id
"""

# provider-independence under the gate: the RocksDB-backed fold must
# hash-match the exact same SQL as the default-provider fold
ORACLES["streaming_fold_rocksdb"] = ORACLES["streaming_resumable_fold"]

ORACLES["dedup_band_cap_stats"] = """
WITH b AS (
  SELECT doc_id,
    CAST(floor(n_chars / 200) AS BIGINT) AS len_band,
    CAST(('0x' || substring(md5(text), 1, 1)) AS BIGINT) AS band,
    CAST(('0x' || substring(md5(text), 2, 1)) AS BIGINT) AS band2
  FROM documents
), sub AS (
  SELECT len_band, band, band2, COUNT(*) AS c
  FROM b GROUP BY len_band, band, band2
)
SELECT len_band, band,
  CAST(SUM(c) AS BIGINT) AS grp_n,
  CAST(CASE WHEN SUM(c) > 25 THEN 1 ELSE 0 END AS INT) AS capped,
  CAST(SUM(c) * (SUM(c) - 1) // 2 AS BIGINT) AS pairs_uncapped,
  CAST(CASE WHEN SUM(c) > 25 THEN SUM(c * (c - 1) // 2)
       ELSE SUM(c) * (SUM(c) - 1) // 2 END AS BIGINT) AS pairs_kept
FROM sub GROUP BY len_band, band
"""

# simhash_band_cap_stats: the REAL simhash_candidates operator with a
# FIRING band cap, reproduced bit-for-bit — signatures are md5
# arithmetic, the salt is sig % 16 exactly when the (band, chunk)
# bucket exceeds the cap, and the radius-1 verify (bit_count(xor) <= 1
# in Spark) is the power-of-two identity (x & (x-1)) = 0 here, which
# holds for x = 0 too.  A regression in the operator's split logic
# (wrong salt expression, wrong fire threshold, dropped co-location)
# moves pairs_found and fails the value hash.
ORACLES["simhash_band_cap_stats"] = """
WITH sigs AS (
  SELECT doc_id,
    CAST(('0x' || substring(md5(source), 1, 4)) AS BIGINT) % 1024 AS cluster,
    CAST(('0x' || substring(md5(source), 1, 4)) AS BIGINT) % 1024 * 65536
      + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT)
      AS sig
  FROM documents
), banded AS (
  SELECT doc_id, cluster, sig, b.band,
         CASE WHEN b.band = 0 THEN sig % 65536 ELSE sig // 65536 END AS chunk
  FROM sigs, (VALUES (0), (1)) b(band)
), sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY band, chunk) AS n FROM banded
), salted AS (
  SELECT doc_id, sig, band, chunk,
         CASE WHEN n > 12 THEN sig % 16 ELSE -1 END AS salt
  FROM sized
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM salted a JOIN salted b USING (band, chunk, salt)
  WHERE a.doc_id < b.doc_id
    AND (xor(a.sig, b.sig) & (xor(a.sig, b.sig) - 1)) = 0
), ppc AS (
  SELECT s.cluster, COUNT(*) AS pairs_found
  FROM pairs p JOIN sigs s ON p.id_a = s.doc_id
  GROUP BY s.cluster
), fired AS (
  SELECT band, chunk FROM banded GROUP BY band, chunk HAVING COUNT(*) > 12
), cpc AS (
  SELECT cluster, COUNT(DISTINCT band * 65536 + chunk) AS capped_buckets
  FROM banded SEMI JOIN fired USING (band, chunk)
  GROUP BY cluster
), base AS (
  SELECT cluster, COUNT(*) AS n_docs FROM sigs GROUP BY cluster
)
SELECT base.cluster, base.n_docs,
  CAST(COALESCE(cpc.capped_buckets, 0) AS BIGINT) AS capped_buckets,
  CAST(COALESCE(ppc.pairs_found, 0) AS BIGINT) AS pairs_found
FROM base
LEFT JOIN cpc ON base.cluster = cpc.cluster
LEFT JOIN ppc ON base.cluster = ppc.cluster
"""

ORACLES["skew_salted_enrich_join"] = """
WITH fact AS (
  SELECT CASE WHEN event_id % 3 < 2 THEN 0
              ELSE user_id % 100 END AS k,
         CAST(floor(value * 1000) AS BIGINT) AS vm,
         event_type
  FROM events
), dim AS (
  SELECT i AS k, i % 7 + 1 AS w FROM range(100) t(i)
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(vm * w) AS BIGINT) AS weighted
FROM fact JOIN dim USING (k)
GROUP BY event_type
"""


ORACLES["skew_salted_type_counts"] = f"""
SELECT event_type, COUNT(*) AS n_events,
  {_dsum('value')} AS total,
  max(value) AS max_value
FROM events GROUP BY event_type
"""

ORACLES["sql_api_revenue_by_segment"] = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
  {_dsum('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

# stream-stream join shares the batch interval join's oracle verbatim
ORACLES["streaming_interval_join"] = ORACLES["interval_join_views_purchases"]

ORACLES["streaming_distinct_users"] = """
SELECT DISTINCT user_id FROM events
"""

# Verifies the INCREMENTAL interleave positionally: the streaming side
# assigns (rn, side) across three triggers per side with running
# offsets; two plain row_number windows must reproduce every key.
ORACLES["streaming_merge_interleaved_events"] = """
WITH a AS (
  SELECT event_id,
    CAST(row_number() OVER (ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn,
    0 AS side
  FROM events WHERE event_type = 'view' AND user_id % 7 = 0
), b AS (
  SELECT event_id,
    CAST(row_number() OVER (ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn,
    1 AS side
  FROM events WHERE event_type = 'purchase' AND user_id % 7 = 0
)
SELECT event_id, CAST(side AS INTEGER) AS side, rn FROM a
UNION ALL
SELECT event_id, CAST(side AS INTEGER) AS side, rn FROM b
"""


ORACLES["streaming_merge_union"] = """
SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 2 = 1
"""

ORACLES["q2_min_cost_supplier"] = """
WITH sn AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), best AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem JOIN sn ON l_suppkey = s_suppkey
  QUALIFY row_number() OVER (PARTITION BY l_partkey
                             ORDER BY unit_price, s_suppkey) = 1
)
SELECT p_partkey, p_brand, s_name, n_name, unit_price, s_acctbal
FROM best JOIN part ON l_partkey = p_partkey
WHERE p_size >= 30
"""

ORACLES["q9_profit_by_nation_year"] = f"""
SELECT n_name AS nation,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  {_dsum('l_extendedprice*(1-l_discount) - p_retailprice*l_quantity')} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""

ORACLES["q11_part_value_concentration"] = f"""
SELECT l_partkey, {_dsum('l_extendedprice')} AS value
FROM lineitem
GROUP BY l_partkey
HAVING {_dsum('l_extendedprice')} >
  (SELECT {_dsum('l_extendedprice')} * 0.0007 FROM lineitem)
"""

ORACLES["q16_supplier_variety"] = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

ORACLES["q20_heavy_part_shippers"] = f"""
WITH recent AS (
  SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
), per_ps AS (
  SELECT l_partkey, l_suppkey, {_dsum('l_quantity')} AS supp_qty
  FROM recent GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey, {_dsum('l_quantity')} * 0.2 AS thr
  FROM recent GROUP BY l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT DISTINCT l_suppkey FROM per_ps JOIN per_p USING (l_partkey)
  WHERE supp_qty > thr
)
"""

ORACLES["q21_sole_return_supplier"] = """
SELECT s_name, n_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R'
  AND l1.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name, n_name
"""

ORACLES["split_train_test_hash"] = """
SELECT doc_id,
  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccc' THEN 'train' ELSE 'test' END AS split
FROM documents
"""

ORACLES["sample_stratified_docs"] = """
SELECT doc_id, lang, source FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) < (CASE WHEN lang = 'en' THEN '4' ELSE '8' END)
"""

ORACLES["pii_redact_docs"] = """
WITH c AS (
  SELECT doc_id,
    source || '+' || CAST(doc_id AS VARCHAR) || '@example.com ph 555-0142' AS contact
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(contact, '[a-z0-9+._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9][0-9-]+[0-9]', '<PHONE>', 'g') AS redacted,
  CAST(length(contact) - length(regexp_replace(contact, '@', '', 'g')) AS BIGINT) AS n_emails
FROM c
"""

ORACLES["quality_repetition_ratio"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS w FROM documents
), per AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
)
SELECT doc_id,
  CAST(max(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_term_ratio,
  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS type_token_ratio,
  CAST(SUM(c) AS BIGINT) AS n_words
FROM per GROUP BY doc_id
"""

ORACLES["embedding_norms"] = """
SELECT vec_id,
  CAST(len(embedding) AS INTEGER) AS dim,
  round(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
"""

ORACLES["embedding_centroids"] = """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS x
  FROM embeddings
)
SELECT label, CAST(pos AS INTEGER) AS pos,
  CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS centroid,
  COUNT(*) AS n
FROM ex GROUP BY label, pos
"""


ORACLES["decontaminate_ngram"] = r"""
WITH toks AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id, source, unnest(
    CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
         ELSE [array_to_string(w[i:i+4], ' ') for i in range(1, len(w) - 3)] END) AS g
  FROM toks
), bench AS (
  SELECT DISTINCT g FROM sh WHERE source IN ('src0', 'src1')
), train AS (
  SELECT DISTINCT doc_id, g FROM sh WHERE source NOT IN ('src0', 'src1')
)
SELECT doc_id, COUNT(*) AS n_shared
FROM train JOIN bench USING (g)
GROUP BY doc_id
"""

ORACLES["pack_sequences_bins"] = r"""
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT shard, CAST(floor(cum_before / 512) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY shard, bin
"""

ORACLES["docs_length_band"] = """
WITH b AS (
  SELECT round(quantile_cont(n_chars, 0.05), 6) AS lo,
         round(quantile_cont(n_chars, 0.95), 6) AS hi
  FROM documents
)
SELECT doc_id, n_chars, lang
FROM documents, b
WHERE n_chars >= lo AND n_chars <= hi
"""


ORACLES["streaming_session_30m"] = ORACLES["session_30m"]


ORACLES["ann_radius_neighbors"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 50),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
    round({_DOT} / ({_QNORM} * {_CNORM}), 6) AS cos_sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cos_sim FROM s WHERE cos_sim >= 0.3
"""

ORACLES["sample_per_lang_hash"] = """
WITH r AS (
  SELECT doc_id, lang,
    CAST(row_number() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS INTEGER) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 100
"""

ORACLES["shard_assign_stats"] = r"""
WITH t AS (
  SELECT
    CAST(((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 64
      AS INTEGER) AS shard,
    len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM t GROUP BY shard
"""

# The Spark side routes through a bucketed saveAsTable + two catalog
# reads, so a hash match here verifies the bucketed write/read
# round-trip byte-for-byte, not just the join logic.
ORACLES["bucketed_dedup_enrich_join"] = """
WITH b AS (
  SELECT doc_id, n_chars,
    CAST(floor(n_chars / 10) AS BIGINT) AS len_band,
    CAST(('0x' || substring(md5(text), 1, 1)) AS BIGINT) AS band,
    CAST(('0x' || substring(md5(text), 2, 1)) AS BIGINT) AS band2
  FROM documents
), g AS (
  SELECT len_band, band, COUNT(*) AS grp_n FROM b GROUP BY len_band, band
), t AS (
  -- r9 band cap: groups over 200 docs split on the secondary digit
  -- (same CASE as the Spark side; never fires on the gate corpora)
  SELECT b.*, CASE WHEN g.grp_n > 200 THEN b.band2 ELSE -1 END AS salt
  FROM b JOIN g ON b.len_band = g.len_band AND b.band = g.band
), cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM t x JOIN t y
    ON x.len_band = y.len_band AND x.band = y.band AND x.salt = y.salt
  WHERE x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
  p.n_chars AS len_a, q.n_chars AS len_b,
  round(least(p.n_chars, q.n_chars) * 1.0 / greatest(p.n_chars, q.n_chars), 6)
    AS len_ratio
FROM cand c
JOIN b p ON c.doc_a = p.doc_id
JOIN b q ON c.doc_b = q.doc_id
"""


ORACLES["partitioned_io_pruned"] = """
SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE lang IN ('en', 'de')
GROUP BY lang, source
"""


ORACLES["streaming_sliding_10m"] = ORACLES["sliding_10m"]

ORACLES["quality_unigram_logprob"] = r"""
WITH toks AS (
  SELECT doc_id,
    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
), tot AS (SELECT SUM(cnt) AS total FROM vocab),
lp AS (
  SELECT tok, round(ln(cnt::DOUBLE / total), 6) AS logp FROM vocab CROSS JOIN tot
)
SELECT doc_id,
  round(CAST(SUM(CAST(logp AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS lm_score,
  COUNT(*) AS n_tokens
FROM toks JOIN lp USING (tok)
GROUP BY doc_id
"""

ORACLES["quality_bigram_logprob"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), bg AS (
  SELECT doc_id,
    unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS bg
  FROM toks WHERE len(w) >= 2
), counts AS (
  SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg
), ctx AS (
  SELECT string_split(bg, ' ')[1] AS w1, SUM(cnt) AS ctx_cnt
  FROM counts GROUP BY w1
), model AS (
  SELECT bg, round(ln(cnt::DOUBLE / ctx_cnt), 6) AS logp
  FROM counts JOIN ctx ON string_split(counts.bg, ' ')[1] = ctx.w1
)
SELECT doc_id,
  round(CAST(SUM(CAST(logp AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS lm_score,
  COUNT(*) AS n_bigrams
FROM bg JOIN model USING (bg)
GROUP BY doc_id
"""

ORACLES["mix_sources_token_budget"] = r"""
WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents WHERE trim(text) <> ''
  UNION ALL
  SELECT doc_id, source, CAST(0 AS BIGINT) FROM documents WHERE trim(text) = ''
), c AS (
  SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tokens, cum_before FROM c WHERE cum_before < 20000
"""

ORACLES["top_bigrams_global"] = r"""
WITH toks AS (
  SELECT string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), bg AS (
  SELECT unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS bg
  FROM toks WHERE len(w) >= 2
)
SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg
ORDER BY cnt DESC, bg ASC LIMIT 20
"""

ORACLES["cdc_scd2_intervals"] = """
SELECT user_id, event_id, ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS valid_to,
  value AS held_value
FROM events
"""

ORACLES["dsir_importance_weights"] = r"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), bg AS (
  SELECT doc_id, lang,
    unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS bg
  FROM toks WHERE len(w) >= 2
), fb AS (
  SELECT doc_id, lang,
    CAST((instr('0123456789abcdef', substring(md5(bg), 1, 1)) - 1) * 16
       + (instr('0123456789abcdef', substring(md5(bg), 2, 1)) - 1) AS INTEGER) AS b
  FROM bg
), raw AS (
  SELECT b, COUNT(*) AS raw_cnt FROM fb GROUP BY b
), tgt AS (
  SELECT b, COUNT(*) AS tgt_cnt FROM fb WHERE lang = 'en' GROUP BY b
), tots AS (
  SELECT (SELECT SUM(raw_cnt) FROM raw) AS raw_tot,
         (SELECT COALESCE(SUM(tgt_cnt), 0) FROM tgt) AS tgt_tot
), model AS (
  SELECT b, round(ln(
      ((COALESCE(tgt_cnt, 0) + 1)::DOUBLE / (tgt_tot + 256))
    / ((raw_cnt + 1)::DOUBLE / (raw_tot + 256))
  ), 6) AS logratio
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots
)
SELECT doc_id,
  CAST(SUM(CAST(logratio AS DECIMAL(27,6))) AS DOUBLE) AS dsir_logweight,
  COUNT(*) AS n_feats
FROM fb JOIN model USING (b)
GROUP BY doc_id
"""

ORACLES["sample_weighted_per_source"] = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    round(pow(
      (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
        / 4294967297.0,
      1.0 / greatest(n_chars, 1)
    ), 12) AS es_key
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY es_key DESC, doc_id ASC
    ) AS INTEGER) AS draw_rank
  FROM keyed
)
SELECT doc_id, source, n_chars, draw_rank FROM ranked WHERE draw_rank <= 20
"""

ORACLES["dedup_incremental_new_docs"] = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE source <> 'src0'
  AND md5({NORM_TEXT}) NOT IN (
    SELECT md5({NORM_TEXT}) FROM documents WHERE source = 'src0'
  )
"""

ORACLES["streaming_funnel_conversions"] = """
WITH v AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
), paired AS (
  SELECT p.user_id, p.event_id AS purchase_event_id, epoch_us(p.ts) AS pts,
    (SELECT v.event_id FROM v
     WHERE v.user_id = p.user_id
       AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
     ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id,
    (SELECT epoch_us(v.ts) FROM v
     WHERE v.user_id = p.user_id
       AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
     ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS vts
  FROM p
)
SELECT user_id, view_event_id, purchase_event_id,
  (pts - vts) // 1000000 AS lag_sec
FROM paired
WHERE view_event_id IS NOT NULL AND pts - vts <= 30 * 60 * 1000000
"""

ORACLES["gapfill_hourly_counts"] = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
    COUNT(*) AS n_events,
    {_dsum('value')} AS sum_value
  FROM events GROUP BY 1
), b AS (
  SELECT min(h) AS lo, max(h) AS hi FROM hourly
), spectrum AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
)
SELECT CAST(floor(epoch(spectrum.h)) AS BIGINT) AS hour_start,
  COALESCE(n_events, 0) AS n_events,
  sum_value
FROM spectrum LEFT JOIN hourly ON spectrum.h = hourly.h
"""

ORACLES["unpivot_doc_metrics"] = r"""
WITH wide AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tokens,
    CAST(length(text) AS BIGINT) AS raw_len
  FROM documents
)
SELECT doc_id, 'chars' AS metric, chars AS value FROM wide
UNION ALL SELECT doc_id, 'tokens', tokens FROM wide
UNION ALL SELECT doc_id, 'raw_len', raw_len FROM wide
"""

ORACLES["approx_top_tokens"] = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
), c AS (
  SELECT tok, COUNT(*) AS est_count FROM toks GROUP BY tok
)
SELECT tok, est_count, CAST(0 AS BIGINT) AS max_overcount
FROM c ORDER BY est_count DESC, tok ASC LIMIT 10
"""

ORACLES["source_kl_divergence"] = r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
), src_cnt AS (
  SELECT source, tok, COUNT(*) AS s_cnt FROM toks GROUP BY source, tok
), glob_cnt AS (
  SELECT tok, COUNT(*) AS g_cnt FROM toks GROUP BY tok
), vocab AS (
  SELECT COUNT(*) AS v, SUM(g_cnt) AS g_tot FROM glob_cnt
), src_tot AS (
  SELECT source, SUM(s_cnt) AS s_tot FROM src_cnt GROUP BY source
), term AS (
  SELECT source,
    round(
      ((s_cnt + 1)::DOUBLE / (s_tot + v))
      * ln(((s_cnt + 1)::DOUBLE / (s_tot + v))
         / ((g_cnt + 1)::DOUBLE / (g_tot + v))), 6) AS kl_term
  FROM src_cnt
  JOIN glob_cnt USING (tok)
  JOIN src_tot USING (source)
  CROSS JOIN vocab
)
SELECT source,
  CAST(SUM(CAST(kl_term AS DECIMAL(27,6))) AS DOUBLE) AS kl_to_corpus,
  COUNT(*) AS n_terms
FROM term GROUP BY source
"""

ORACLES["grouping_sets_priority_flag"] = f"""
SELECT o_orderpriority, o_orderstatus,
  CAST(grouping(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
  COUNT(*) AS n_orders,
  {_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""

ORACLES["orders_price_percentile"] = """
SELECT o_orderkey, o_orderpriority,
  round(percent_rank() OVER w, 6) AS price_pct_rank,
  round(cume_dist() OVER w, 6) AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""

# TTL sessionized fold with watermark eviction: islands by gap > TTL;
# every non-final island is emitted (in-batch split or timeout —
# equivalent under in-order delivery), the final island only when the
# FINAL watermark (max_ms - delay_ms, the engine's own arithmetic)
# strictly clears its last event + TTL.  vu = floor(value*1e6) keeps
# the fold integer-exact in both engines.
ORACLES["streaming_ttl_sessions"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 1000000) AS BIGINT) AS vu
  FROM events WHERE user_id % 5 = 0
), m AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                      > 30000000000 THEN 1 ELSE 0 END AS brk
  FROM e
), g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
), isls AS (
  SELECT user_id, isl,
         CAST(SUM(vu) AS BIGINT) AS acc_units,
         COUNT(*) AS n,
         MIN(ts_us) AS start_us,
         MAX(ts_us) AS last_us,
         MAX(isl) OVER (PARTITION BY user_id) AS last_isl
  FROM g GROUP BY user_id, isl
), wm AS (
  SELECT max(ts_us) // 1000 - 10000 AS wm_ms FROM e
)
SELECT user_id, acc_units, n, start_us, last_us
FROM isls, wm
WHERE isl < last_isl OR last_us // 1000 + 30000000 < wm_ms
"""


ORACLES["streaming_fold_evicted"] = """
WITH e0 AS (
  SELECT user_id * 100000 + epoch_us(ts) // 86400000000 AS k,
         epoch_us(ts) AS ts_us,
         CAST(floor(value * 1000000) AS BIGINT) AS vu
  FROM events WHERE user_id % 5 = 1
), b AS (
  SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM e0
), e AS (
  SELECT e0.*, LEAST((ts_us - b.mn) * 4 // (b.mx - b.mn + 1), 3) AS slice
  FROM e0, b
), per AS (
  -- one update-mode emission per (key, slice-with-events)
  SELECT k, slice, CAST(SUM(vu) AS BIGINT) AS s_vu,
         COUNT(*) AS s_n, MAX(ts_us) AS s_last
  FROM e GROUP BY k, slice
), cum AS (
  SELECT k, slice,
         CAST(SUM(s_vu) OVER w AS BIGINT) AS acc_units,
         CAST(SUM(s_n) OVER w AS BIGINT) AS n,
         MAX(s_last) OVER w AS last_us
  FROM per
  WINDOW w AS (PARTITION BY k ORDER BY slice ROWS UNBOUNDED PRECEDING)
), fin AS (
  SELECT k, acc_units, n, last_us,
         row_number() OVER (PARTITION BY k ORDER BY slice DESC) AS rn
  FROM cum
), wm AS (
  -- engine watermark arithmetic: floor(max_us/1000) - delay_ms
  SELECT mx // 1000 - 10000 AS wm_ms FROM b
)
SELECT k AS fold_key, acc_units, n FROM cum
UNION ALL
-- eviction flush: duplicate of the key's final cumulative row iff the
-- final watermark STRICTLY clears last_event_ms + gap (2 days); the
-- watermark only grows, so this one rule also covers mid-drain flushes
SELECT k AS fold_key, acc_units, n FROM fin, wm
WHERE rn = 1 AND last_us // 1000 + 172800000 < wm_ms
"""


ORACLES["streaming_late_data"] = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
), e AS (
  SELECT epoch_us(ts) AS ts_us,
         date_trunc('hour', ts) AS wstart,
         LEAST((epoch_us(ts) - b.mn) * 4 // (b.mx - b.mn + 1)
               + CASE WHEN event_id % 20 = 0 THEN 1 ELSE 0 END, 3) AS slice
  FROM events, b
), smax AS (
  SELECT slice, max(ts_us) AS mx_us FROM e GROUP BY slice
), kept AS (
  -- row-drop rule (probed empirically on the engine): the late filter
  -- for batch i uses the PREVIOUS batch's watermark, i.e. the max
  -- event time over slices <= i-2 (ms resolution, floor(max_us/1000) -
  -- delay_ms); a row is dropped when its window END is at or below it.
  -- Eviction at end of batch i uses the CURRENT wm (slices <= i-1), so
  -- an evicted window's stragglers are always caught by this filter in
  -- later batches — no duplicate emissions.
  SELECT e.* FROM e
  WHERE (SELECT max(p.mx_us) FROM smax p WHERE p.slice < e.slice - 1) IS NULL
     OR epoch_us(e.wstart + INTERVAL 1 HOUR)
        > ((SELECT max(p.mx_us) FROM smax p WHERE p.slice < e.slice - 1) // 1000
           - 1753000) * 1000
)
-- append mode emits only windows finalized by the LAST watermark
SELECT kept.wstart AS window_start, COUNT(*) AS n_events
FROM kept, (SELECT max(ts_us) AS mx FROM e) f
WHERE epoch_us(kept.wstart + INTERVAL 1 HOUR) <= (f.mx // 1000 - 1753000) * 1000
GROUP BY 1
"""

ORACLES["approx_top_tokens_eviction_bound"] = """
WITH keyed AS (
  SELECT CASE WHEN event_id % 10 < 6
              THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
              ELSE 'cold_' || CAST(event_id % 997 AS VARCHAR) END AS tok
  FROM events
), cnt AS (
  SELECT tok, COUNT(*) AS true_count FROM keyed GROUP BY tok
)
-- keys above N/capacity are GUARANTEED in the merged SpaceSaving
-- summary with true <= est <= true + max_overcount, so the engine's
-- bound booleans must come back TRUE and the key set/counts are exact
SELECT tok, true_count, TRUE AS lower_ok, TRUE AS upper_ok
FROM cnt
WHERE true_count > (SELECT SUM(true_count) FROM cnt) / 64.0
"""

# Streaming SpaceSaving guarantee protocol: md5 bucket split (cross-
# engine), per-bucket threshold n_b/capacity; guaranteed keys carry
# exact counts and TRUE bound booleans (a dropped guaranteed key or a
# bound violation surfaces as a row/hash mismatch).
ORACLES["streaming_topk_spacesaving"] = """
WITH keyed AS (
  SELECT CASE WHEN event_id % 10 < 6
              THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
              ELSE 'cold_' || CAST(event_id % 997 AS VARCHAR) END AS tok
  FROM events
), b AS (
  SELECT tok,
    CAST(CAST(('0x' || substring(md5(tok), 1, 4)) AS BIGINT) % 4 AS INTEGER) AS bucket
  FROM keyed
), cnt AS (
  SELECT bucket, tok, COUNT(*) AS true_count FROM b GROUP BY 1, 2
), tot AS (
  SELECT bucket, SUM(true_count) AS n_b FROM cnt GROUP BY 1
)
SELECT tok, bucket, true_count, TRUE AS lower_ok, TRUE AS upper_ok
FROM cnt JOIN tot USING (bucket)
WHERE true_count > n_b / 64.0
"""


ORACLES["ewma_user_values"] = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, CAST(value AS DOUBLE) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), ew AS (
  SELECT user_id, event_id, rn, x AS y FROM seq WHERE rn = 1
  UNION ALL
  -- literally the Spark recurrence: a*x + (1-a)*y on IEEE doubles,
  -- same multiply/add order, so pre-round values are bit-equal
  SELECT s.user_id, s.event_id, s.rn,
         CAST(0.3 AS DOUBLE) * s.x
           + (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * e.y
  FROM ew e JOIN seq s ON s.user_id = e.user_id AND s.rn = e.rn + 1
)
SELECT event_id, user_id,
  -- same primitive rounding expression as the Spark side (engine
  -- round() implementations disagree at 6dp boundaries on bit-equal
  -- doubles); floor() in DuckDB returns DOUBLE, same value as Spark's
  -- LONG floor widened back to double in the division
  floor(y * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
    / CAST(1000000 AS DOUBLE) AS ewma_value
FROM ew
"""

ORACLES["multimodal_png_dims"] = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
  'image/png' AS mime,
  CAST(n_chars % 256 + 1 AS INTEGER) AS width,
  CAST(48 AS INTEGER) AS height
FROM documents
"""

ORACLES["multimodal_bmp_mean_rgb"] = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
  list_sum(list_transform(generate_series(0, 7), r -> (doc_id*3 + r) % 256)) / 8.0 AS mean_r,
  list_sum(list_transform(generate_series(0, 7), r -> (n_chars + 2*r) % 256)) / 8.0 AS mean_g,
  list_sum(list_transform(generate_series(0, 7), r -> (doc_id + r) % 256)) / 8.0 AS mean_b,
  CAST(54 + ((((n_chars % 16 + 1) * 3 + 3) // 4) * 4) * 8 AS INTEGER) AS n_bytes
FROM documents
"""

ORACLES["multimodal_frame_sample"] = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
  unnest(generate_series(0, greatest(CAST(n_chars % 1000 + 100 AS INTEGER) - 1, 0), 250))::BIGINT AS frame_ts_ms
FROM documents
"""


# Coefficients baked from arith_hash_family(16) — regenerate with
# scripts/gen_arith_minhash_oracle.py if the family ever changes.
ORACLES["dedup_minhash_arith_survivors"] = f"""
WITH hx AS (
  SELECT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) % 2147483647 AS x
  FROM (SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s FROM documents)
), m AS (
  SELECT doc_id,
    min((314187*x + 1299721) % 2147483647) AS m0,
    min((523645*x + 2599442) % 2147483647) AS m1,
    min((733103*x + 3899163) % 2147483647) AS m2,
    min((942561*x + 5198884) % 2147483647) AS m3,
    min((1152019*x + 6498605) % 2147483647) AS m4,
    min((1361477*x + 7798326) % 2147483647) AS m5,
    min((1570935*x + 9098047) % 2147483647) AS m6,
    min((1780393*x + 10397768) % 2147483647) AS m7,
    min((1989851*x + 11697489) % 2147483647) AS m8,
    min((2199309*x + 12997210) % 2147483647) AS m9,
    min((2408767*x + 14296931) % 2147483647) AS m10,
    min((2618225*x + 15596652) % 2147483647) AS m11,
    min((2827683*x + 16896373) % 2147483647) AS m12,
    min((3037141*x + 18196094) % 2147483647) AS m13,
    min((3246599*x + 19495815) % 2147483647) AS m14,
    min((3456057*x + 20795536) % 2147483647) AS m15
  FROM hx GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, CAST(m0 AS VARCHAR) || '_' || CAST(m1 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 1 AS band, CAST(m2 AS VARCHAR) || '_' || CAST(m3 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 2 AS band, CAST(m4 AS VARCHAR) || '_' || CAST(m5 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 3 AS band, CAST(m6 AS VARCHAR) || '_' || CAST(m7 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 4 AS band, CAST(m8 AS VARCHAR) || '_' || CAST(m9 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 5 AS band, CAST(m10 AS VARCHAR) || '_' || CAST(m11 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 6 AS band, CAST(m12 AS VARCHAR) || '_' || CAST(m13 AS VARCHAR) AS key FROM m
  UNION ALL
  SELECT doc_id, 7 AS band, CAST(m14 AS VARCHAR) || '_' || CAST(m15 AS VARCHAR) AS key FROM m
), dropped AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY band, key) AS mn FROM bands
  ) WHERE doc_id > mn
)
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


# Incremental near-dedup vs the persisted index: same band-key CTEs,
# but the drop rule is "arriving doc collides with any SEEN (src0)
# doc's band bucket" — the SQL restatement of the stored-index
# semi-join (the oracle recomputes what Spark reads back from the
# atomic-group parquet).
ORACLES["dedup_incremental_minhash"] = (
    ORACLES["dedup_minhash_arith_survivors"].split("), dropped AS")[0]
    + """), side AS (
  SELECT b.doc_id, b.band, b.key, d.source FROM bands b
  JOIN documents d USING (doc_id)
), dup AS (
  SELECT DISTINCT a.doc_id FROM side a JOIN side s
  ON a.band = s.band AND a.key = s.key
  WHERE a.source <> 'src0' AND s.source = 'src0'
)
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM dup)
"""
)


# Streaming incremental twin: batch k == slice k (doc_id % 3), the
# index is the union of earlier slices' band rows, within-batch pairs
# deliberately unchecked — dup iff an EARLIER-slice doc shares a band
# bucket.
ORACLES["streaming_dedup_incremental_minhash"] = (
    ORACLES["dedup_minhash_arith_survivors"].split("), dropped AS")[0]
    + """), side AS (
  SELECT b.doc_id, b.band, b.key, CAST(d.doc_id % 3 AS INTEGER) AS slice
  FROM bands b JOIN documents d USING (doc_id)
), dup AS (
  SELECT DISTINCT a.doc_id FROM side a JOIN side s
  ON a.band = s.band AND a.key = s.key
  WHERE s.slice < a.slice
)
SELECT d.doc_id, d.source, d.n_chars, CAST(d.doc_id % 3 AS INTEGER) AS slice
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
"""
)


# survivor-anchored index maintenance (r11, append_scope="survivors"):
# the slice-2 collision check counts only witnesses from slice 0 (the
# bootstrap epoch stores the whole batch) or SURVIVING slice-1 docs —
# the one-level unroll of the no-transitive-rejection contract, vs the
# "all" policy above where a rejected slice-1 doc's signatures still
# reject slice-2 docs.
ORACLES["streaming_dedup_incremental_survivors"] = (
    ORACLES["dedup_minhash_arith_survivors"].split("), dropped AS")[0]
    + """), side AS (
  SELECT b.doc_id, b.band, b.key, CAST(d.doc_id % 3 AS INTEGER) AS slice
  FROM bands b JOIN documents d USING (doc_id)
), d1 AS (
  SELECT DISTINCT a.doc_id FROM side a JOIN side s
  ON a.band = s.band AND a.key = s.key
  WHERE a.slice = 1 AND s.slice = 0
), d2 AS (
  SELECT DISTINCT a.doc_id FROM side a JOIN side s
  ON a.band = s.band AND a.key = s.key
  WHERE a.slice = 2 AND (
    s.slice = 0
    OR (s.slice = 1 AND s.doc_id NOT IN (SELECT doc_id FROM d1))
  )
)
SELECT d.doc_id, d.source, d.n_chars, CAST(d.doc_id % 3 AS INTEGER) AS slice
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM d1)
  AND d.doc_id NOT IN (SELECT doc_id FROM d2)
"""
)


# CC survivor policy over the arith band family: reuse the band-key
# CTEs verbatim (split at the survivor tail) and replace the greedy
# bucket-min drop with star edges -> recursive transitive closure ->
# smallest-label component — the oracle twin of connected_components()
# composed with arith_minhash_bands().
ORACLES["dedup_minhash_arith_cc_survivors"] = (
    ORACLES["dedup_minhash_arith_survivors"]
    .split("), dropped AS")[0]
    .replace("WITH hx AS", "WITH RECURSIVE hx AS", 1)
    + """), star AS (
  SELECT mn AS src, doc_id AS dst FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY band, key) AS mn FROM bands
  ) WHERE doc_id > mn
), und AS (
  SELECT DISTINCT src, dst FROM star
  UNION
  SELECT DISTINCT dst, src FROM star
), reach AS (
  SELECT src AS node, dst AS r FROM und
  UNION
  SELECT reach.node, und.dst FROM reach JOIN und ON reach.r = und.src
), comp AS (
  SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node
), dropped AS (
  SELECT node AS doc_id FROM comp WHERE comp < node
)
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""
)


ORACLES["connected_components_jaccard"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents WHERE doc_id < 1250
), sized AS (
  SELECT doc_id, s, len(s) AS n FROM sh
), edges AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b
    ON a.doc_id < b.doc_id AND a.n <= 2*b.n AND b.n <= 2*a.n
  WHERE len(list_intersect(a.s, b.s))
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), und AS (
  SELECT id_a AS src, id_b AS dst FROM edges UNION SELECT id_b, id_a FROM edges
), reach AS (
  SELECT src AS node, dst AS r FROM und
  UNION
  SELECT reach.node, und.dst FROM reach JOIN und ON reach.r = und.src
)
SELECT node AS doc_id, least(node, min(r)) AS comp FROM reach GROUP BY node
"""


ORACLES["streaming_dedup_watermark"] = """
SELECT event_id, ts FROM events
"""


ORACLES["array_hof_doc_stats"] = r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents)
SELECT doc_id,
  len(list_filter(tk, t -> length(t) > 6)) AS n_long_tokens,
  CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT) AS total_token_chars,
  CAST(list_max(list_transform(tk, t -> length(t))) AS BIGINT) AS max_token_len,
  len(list_filter(tk, t -> regexp_matches(t, '[0-9]'))) > 0 AS has_numeric_token,
  len(list_distinct(tk)) AS n_distinct_tokens
FROM t
"""


# Spark dayofweek is 1=Sunday..7=Saturday; DuckDB's is 0-based -> +1.
# Spark date_trunc returns TIMESTAMP (DuckDB: DATE) and last_day /
# add_months return DATE — both sides cast to TIMESTAMP so the compare
# sees one dtype.
ORACLES["datetime_funcs_events"] = """
SELECT event_id,
  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
  CAST(quarter(ts) AS INTEGER) AS qtr,
  CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP) AS month_end,
  CAST(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus2m,
  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_since_2024
FROM events
"""


# The est values themselves are engine-internal (sketch-dependent);
# what is hash-checked are the exact rank-window bounds and the TRUE
# booleans asserting the estimate landed inside them — identical
# double-arithmetic rank expressions on both sides.
ORACLES["percentile_approx_bound_check"] = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, max(n) AS n,
  round(max(CASE WHEN rn = greatest(CAST(floor((0.5 - 0.01)*n) AS BIGINT), 1) THEN o_totalprice END), 2) AS rank_lo_p50,
  round(max(CASE WHEN rn = greatest(CAST(floor((0.9 - 0.01)*n) AS BIGINT), 1) THEN o_totalprice END), 2) AS rank_lo_p90,
  round(max(CASE WHEN rn = greatest(CAST(floor((0.99 - 0.01)*n) AS BIGINT), 1) THEN o_totalprice END), 2) AS rank_lo_p99,
  round(max(CASE WHEN rn = least(CAST(ceil((0.5 + 0.01)*n) AS BIGINT) + 1, n) THEN o_totalprice END), 2) AS rank_hi_p50,
  round(max(CASE WHEN rn = least(CAST(ceil((0.9 + 0.01)*n) AS BIGINT) + 1, n) THEN o_totalprice END), 2) AS rank_hi_p90,
  round(max(CASE WHEN rn = least(CAST(ceil((0.99 + 0.01)*n) AS BIGINT) + 1, n) THEN o_totalprice END), 2) AS rank_hi_p99,
  TRUE AS within_p50, TRUE AS within_p90, TRUE AS within_p99
FROM ranked GROUP BY o_orderpriority
"""


ORACLES["streaming_enrich_static"] = """
SELECT e.event_id, e.user_id, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


ORACLES["approx_distinct_bound_check"] = """
SELECT event_type, count(*) AS n_events,
  count(DISTINCT user_id) AS exact_users,
  TRUE AS within_3rsd
FROM events GROUP BY event_type
"""


_SHINGLES2 = f"""
list_transform(
  range(1, greatest(len(string_split({NORM_TEXT}, ' ')) - 1, 1) + 1),
  i -> array_to_string(list_slice(string_split({NORM_TEXT}, ' '), i, i + 1), ' ')
)
"""

# 32-bit md5-derived SimHash: per-bit majority votes packed into one
# BIGINT — regenerated alongside the Spark expressions in
# queries.dedup_simhash_arith_survivors.
ORACLES["dedup_simhash_arith_survivors"] = f"""
WITH hx AS (
  SELECT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS x
  FROM (SELECT doc_id, unnest(list_distinct({_SHINGLES2})) AS s FROM documents)
), votes AS (
  SELECT doc_id,
    sum(CASE WHEN ((x >> 0) & 1) = 1 THEN 1 ELSE -1 END) AS v0,
    sum(CASE WHEN ((x >> 1) & 1) = 1 THEN 1 ELSE -1 END) AS v1,
    sum(CASE WHEN ((x >> 2) & 1) = 1 THEN 1 ELSE -1 END) AS v2,
    sum(CASE WHEN ((x >> 3) & 1) = 1 THEN 1 ELSE -1 END) AS v3,
    sum(CASE WHEN ((x >> 4) & 1) = 1 THEN 1 ELSE -1 END) AS v4,
    sum(CASE WHEN ((x >> 5) & 1) = 1 THEN 1 ELSE -1 END) AS v5,
    sum(CASE WHEN ((x >> 6) & 1) = 1 THEN 1 ELSE -1 END) AS v6,
    sum(CASE WHEN ((x >> 7) & 1) = 1 THEN 1 ELSE -1 END) AS v7,
    sum(CASE WHEN ((x >> 8) & 1) = 1 THEN 1 ELSE -1 END) AS v8,
    sum(CASE WHEN ((x >> 9) & 1) = 1 THEN 1 ELSE -1 END) AS v9,
    sum(CASE WHEN ((x >> 10) & 1) = 1 THEN 1 ELSE -1 END) AS v10,
    sum(CASE WHEN ((x >> 11) & 1) = 1 THEN 1 ELSE -1 END) AS v11,
    sum(CASE WHEN ((x >> 12) & 1) = 1 THEN 1 ELSE -1 END) AS v12,
    sum(CASE WHEN ((x >> 13) & 1) = 1 THEN 1 ELSE -1 END) AS v13,
    sum(CASE WHEN ((x >> 14) & 1) = 1 THEN 1 ELSE -1 END) AS v14,
    sum(CASE WHEN ((x >> 15) & 1) = 1 THEN 1 ELSE -1 END) AS v15,
    sum(CASE WHEN ((x >> 16) & 1) = 1 THEN 1 ELSE -1 END) AS v16,
    sum(CASE WHEN ((x >> 17) & 1) = 1 THEN 1 ELSE -1 END) AS v17,
    sum(CASE WHEN ((x >> 18) & 1) = 1 THEN 1 ELSE -1 END) AS v18,
    sum(CASE WHEN ((x >> 19) & 1) = 1 THEN 1 ELSE -1 END) AS v19,
    sum(CASE WHEN ((x >> 20) & 1) = 1 THEN 1 ELSE -1 END) AS v20,
    sum(CASE WHEN ((x >> 21) & 1) = 1 THEN 1 ELSE -1 END) AS v21,
    sum(CASE WHEN ((x >> 22) & 1) = 1 THEN 1 ELSE -1 END) AS v22,
    sum(CASE WHEN ((x >> 23) & 1) = 1 THEN 1 ELSE -1 END) AS v23,
    sum(CASE WHEN ((x >> 24) & 1) = 1 THEN 1 ELSE -1 END) AS v24,
    sum(CASE WHEN ((x >> 25) & 1) = 1 THEN 1 ELSE -1 END) AS v25,
    sum(CASE WHEN ((x >> 26) & 1) = 1 THEN 1 ELSE -1 END) AS v26,
    sum(CASE WHEN ((x >> 27) & 1) = 1 THEN 1 ELSE -1 END) AS v27,
    sum(CASE WHEN ((x >> 28) & 1) = 1 THEN 1 ELSE -1 END) AS v28,
    sum(CASE WHEN ((x >> 29) & 1) = 1 THEN 1 ELSE -1 END) AS v29,
    sum(CASE WHEN ((x >> 30) & 1) = 1 THEN 1 ELSE -1 END) AS v30,
    sum(CASE WHEN ((x >> 31) & 1) = 1 THEN 1 ELSE -1 END) AS v31
  FROM hx GROUP BY doc_id
), sig AS (
  SELECT doc_id, CAST((CASE WHEN v0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN v1 > 0 THEN 2 ELSE 0 END) + (CASE WHEN v2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN v3 > 0 THEN 8 ELSE 0 END) + (CASE WHEN v4 > 0 THEN 16 ELSE 0 END) + (CASE WHEN v5 > 0 THEN 32 ELSE 0 END) + (CASE WHEN v6 > 0 THEN 64 ELSE 0 END) + (CASE WHEN v7 > 0 THEN 128 ELSE 0 END) + (CASE WHEN v8 > 0 THEN 256 ELSE 0 END) + (CASE WHEN v9 > 0 THEN 512 ELSE 0 END) + (CASE WHEN v10 > 0 THEN 1024 ELSE 0 END) + (CASE WHEN v11 > 0 THEN 2048 ELSE 0 END) + (CASE WHEN v12 > 0 THEN 4096 ELSE 0 END) + (CASE WHEN v13 > 0 THEN 8192 ELSE 0 END) + (CASE WHEN v14 > 0 THEN 16384 ELSE 0 END) + (CASE WHEN v15 > 0 THEN 32768 ELSE 0 END) + (CASE WHEN v16 > 0 THEN 65536 ELSE 0 END) + (CASE WHEN v17 > 0 THEN 131072 ELSE 0 END) + (CASE WHEN v18 > 0 THEN 262144 ELSE 0 END) + (CASE WHEN v19 > 0 THEN 524288 ELSE 0 END) + (CASE WHEN v20 > 0 THEN 1048576 ELSE 0 END) + (CASE WHEN v21 > 0 THEN 2097152 ELSE 0 END) + (CASE WHEN v22 > 0 THEN 4194304 ELSE 0 END) + (CASE WHEN v23 > 0 THEN 8388608 ELSE 0 END) + (CASE WHEN v24 > 0 THEN 16777216 ELSE 0 END) + (CASE WHEN v25 > 0 THEN 33554432 ELSE 0 END) + (CASE WHEN v26 > 0 THEN 67108864 ELSE 0 END) + (CASE WHEN v27 > 0 THEN 134217728 ELSE 0 END) + (CASE WHEN v28 > 0 THEN 268435456 ELSE 0 END) + (CASE WHEN v29 > 0 THEN 536870912 ELSE 0 END) + (CASE WHEN v30 > 0 THEN 1073741824 ELSE 0 END) + (CASE WHEN v31 > 0 THEN 2147483648 ELSE 0 END) AS BIGINT) AS sig FROM votes
), ranked AS (
  SELECT doc_id, sig, row_number() OVER (PARTITION BY sig ORDER BY doc_id) AS rn FROM sig
)
SELECT doc_id, sig FROM ranked WHERE rn = 1
"""


ORACLES["rolling_1h_user_value"] = """
SELECT event_id, user_id,
  count(*) OVER w AS n_1h,
  CAST(sum(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


ORACLES["streaming_upsert_latest"] = """
SELECT user_id, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# The approx structures are seeded/engine-internal; the oracle checks
# the exact ground-truth pair count (20 queries x k=10) and that every
# tier's recall-floor boolean is TRUE.
ORACLES["ann_recall_contract_check"] = """
SELECT t.tier, p.n_exact_pairs, TRUE AS recall_floor_ok
FROM (SELECT unnest(['lsh', 'ivf', 'pq_rerank']) AS tier) t
CROSS JOIN (
  SELECT count(*) AS n_exact_pairs FROM (
    SELECT 1 FROM embeddings q, embeddings c
    WHERE q.vec_id < 20
    QUALIFY row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY
        list_sum(list_transform(range(1, 65), i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
        / (sqrt(list_sum(list_transform(range(1, 65), i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) DESC,
        c.vec_id
    ) <= 10
  )
) p
"""


ORACLES["text_winnow_arith_fingerprints"] = f"""
WITH g AS (
  SELECT doc_id,
    list_transform(
      range(1, greatest(length(nrm) - 7, 1) + 1),
      i -> CAST(('0x' || substring(md5(substring(nrm, i, 8)), 1, 8)) AS BIGINT)
    ) AS hs
  FROM (SELECT doc_id, {NORM_TEXT} AS nrm FROM documents)
)
SELECT doc_id, unnest(list_distinct(
  list_transform(
    range(1, greatest(len(hs) - 3, 1) + 1),
    i -> list_min(list_slice(hs, i, i + least(4, len(hs)) - 1))
  )
)) AS fp
FROM g
"""


ORACLES["dedup_invariant_check"] = """
SELECT unnest(['minhash_greedy', 'minhash_components', 'simhash_exact']) AS variant,
  TRUE AS size_ok, TRUE AS no_exact_twin_survivors
"""


# DuckDB reproduction of the deterministic Python DataSource
# (tubes_spark/datasource.py::arith_events_oracle_sql inlined at its
# query parameters).
ORACLES["custom_source_arith_events"] = """
WITH src AS (
  SELECT i AS event_id, i % 97 AS user_id,
         (i * 7919 % 10000) / 100.0 AS value
  FROM range(20000) t(i)
)
SELECT user_id, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM src GROUP BY user_id
"""


ORACLES["custom_stream_source_drain"] = """
SELECT i AS event_id, i % 97 AS user_id,
       (i * 7919 % 10000) / 100.0 AS value
FROM range(1000) t(i)
"""


# size=64, stride=48 context windows; chunk content verified via md5 of
# the space-joined token window.
ORACLES["chunk_documents_ctx"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
), w AS (
  SELECT doc_id, tk,
    unnest(range(0, greatest(CAST(ceil((len(tk) - 64) / 48.0) AS BIGINT), 0) + 1)) AS w
  FROM t
)
SELECT doc_id, CAST(w AS INTEGER) AS chunk_idx,
  len(list_slice(tk, w*48 + 1, w*48 + 64)) AS n_tokens,
  md5(array_to_string(list_slice(tk, w*48 + 1, w*48 + 64), ' ')) AS chunk_md5
FROM w
"""


# The four stages reuse the exact semantics their standalone oracles
# already verify (dedup_exact_docs, gopher_quality_flags,
# chunk_documents_ctx, export_manifest_shards) chained as CTEs.
ORACLES["pipeline_curation_end_to_end"] = f"""
WITH surv AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY {NORM_TEXT})
), t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM surv
), gated AS (
  SELECT doc_id, tk FROM t
  WHERE len(tk) BETWEEN 50 AND 100000
    AND list_aggregate(list_transform(tk, x -> len(x)), 'sum') * 1.0 / len(tk)
        BETWEEN 3.0 AND 10.0
    AND len(list_intersect(tk, ['the','a','of','to','and','is','in'])) / 7.0
        >= 2.0 / 7.0
    AND len(list_filter(tk, x -> len(x) >= 3)) * 1.0 / len(tk) >= 0.6
    AND len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(tk)
        >= 0.8
), w AS (
  SELECT doc_id, tk,
    unnest(range(0, greatest(CAST(ceil((len(tk) - 64) / 48.0) AS BIGINT), 0) + 1)) AS w
  FROM gated
), ch AS (
  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
    len(list_slice(tk, w*48 + 1, w*48 + 64)) AS n_tokens,
    md5(array_to_string(list_slice(tk, w*48 + 1, w*48 + 64), ' ')) AS chunk_md5
  FROM w
)
SELECT shard, COUNT(*) AS n_chunks, COUNT(DISTINCT doc_id) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  MIN(chunk_md5) AS content_digest
FROM ch GROUP BY shard
"""


ORACLES["custom_sink_manifest_roundtrip"] = """
SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
"""


# Composes the chunk-store closure: the audit is only trustworthy if the
# derived artifact itself is the hash-verified one.
ORACLES["tombstone_delete_propagation"] = f"""
WITH chunks AS ({ORACLES['chunk_documents_ctx']}), sh AS (
  SELECT doc_id, n_tokens, CAST(doc_id % 8 AS INTEGER) AS shard FROM chunks
), tomb AS (
  SELECT doc_id FROM documents WHERE doc_id % 97 = 0
), pre AS (
  SELECT shard, COUNT(*) AS chunks_before,
    CAST(SUM(n_tokens) AS BIGINT) AS tokens_before
  FROM sh GROUP BY shard
), post AS (
  SELECT shard, COUNT(*) AS chunks_after,
    CAST(SUM(n_tokens) AS BIGINT) AS tokens_after
  FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM tomb) GROUP BY shard
), rm AS (
  SELECT shard, COUNT(DISTINCT doc_id) AS docs_removed
  FROM sh WHERE doc_id IN (SELECT doc_id FROM tomb) GROUP BY shard
)
SELECT b.shard, b.chunks_before,
  COALESCE(a.chunks_after, 0) AS chunks_after,
  b.chunks_before - COALESCE(a.chunks_after, 0) AS chunks_removed,
  b.tokens_before,
  COALESCE(a.tokens_after, 0) AS tokens_after,
  CAST(COALESCE(r.docs_removed, 0) AS BIGINT) AS docs_removed
FROM pre b
LEFT JOIN post a USING (shard)
LEFT JOIN rm r USING (shard)
"""


ORACLES["embedding_sq8_roundtrip"] = """
WITH pos AS (
  SELECT vec_id, d - 1 AS d, embedding[d]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) t(d)
), bounds AS (
  SELECT d, min(v) AS lo, max(v) AS hi FROM pos GROUP BY d
), q AS (
  SELECT p.vec_id, p.v,
    greatest(b.hi - b.lo, 1e-12) AS span, b.lo
  FROM pos p JOIN bounds b USING (d)
), e AS (
  SELECT vec_id,
    abs(lo + CAST(round((v - lo) / span * 255) AS INTEGER) * span / 255.0 - v) AS err
  FROM q
), s AS (
  SELECT vec_id, round(max(err), 6) AS max_err,
    round(CAST(sum(CAST(err AS DECIMAL(27,18))) AS DOUBLE) / 64, 6) AS mean_err
  FROM e GROUP BY vec_id
)
SELECT vec_id, max_err, mean_err,
  max_err <= (SELECT max(greatest(hi - lo, 1e-12)) FROM bounds) / 255.0 / 2.0 + 1e-9 AS within_half_step
FROM s
"""


ORACLES["build_vocab_ids"] = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), counts AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS INTEGER) AS token_id,
  tok, n,
  round(n / (SELECT CAST(sum(n) AS DOUBLE) FROM counts), 6) AS corpus_frac
FROM counts
QUALIFY token_id <= 500
"""


# Z-order clustering key: user_id x event-hour interleaved 16+16 bits.
ORACLES["zorder_key_events"] = """
WITH t AS (
  SELECT event_id,
    user_id % 65536 AS u,
    (epoch_us(ts) // 3600000000) % 65536 AS h
  FROM events
)
SELECT event_id, (((u >> 0) & 1) << 0) | (((h >> 0) & 1) << 1) | (((u >> 1) & 1) << 2) | (((h >> 1) & 1) << 3) | (((u >> 2) & 1) << 4) | (((h >> 2) & 1) << 5) | (((u >> 3) & 1) << 6) | (((h >> 3) & 1) << 7) | (((u >> 4) & 1) << 8) | (((h >> 4) & 1) << 9) | (((u >> 5) & 1) << 10) | (((h >> 5) & 1) << 11) | (((u >> 6) & 1) << 12) | (((h >> 6) & 1) << 13) | (((u >> 7) & 1) << 14) | (((h >> 7) & 1) << 15) | (((u >> 8) & 1) << 16) | (((h >> 8) & 1) << 17) | (((u >> 9) & 1) << 18) | (((h >> 9) & 1) << 19) | (((u >> 10) & 1) << 20) | (((h >> 10) & 1) << 21) | (((u >> 11) & 1) << 22) | (((h >> 11) & 1) << 23) | (((u >> 12) & 1) << 24) | (((h >> 12) & 1) << 25) | (((u >> 13) & 1) << 26) | (((h >> 13) & 1) << 27) | (((u >> 14) & 1) << 28) | (((h >> 14) & 1) << 29) | (((u >> 15) & 1) << 30) | (((h >> 15) & 1) << 31) AS zkey
FROM t
"""


# NULL-on-error semantics reproduced with guarded CASE arithmetic; the
# overflow_add hazard is bigint max + (event_id % 2).
ORACLES["ansi_try_funcs"] = """
SELECT event_id,
  CASE WHEN event_id % 10 = 0 THEN NULL
       ELSE value / (event_id % 10) END AS div10,
  CASE WHEN event_id % 2 = 1 THEN NULL
       ELSE 9223372036854775807 END AS overflow_add,
  string_split(event_type, '_')[(event_id % 4 + 1)::INTEGER] AS maybe_part,
  CASE WHEN json_extract_string(props, '$.k') ~ '^[0-9]{1,3}$'
       THEN CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS k_num
FROM events
"""


ORACLES["streaming_incremental_rollup"] = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
FROM events GROUP BY 1
"""


ORACLES["corpus_quality_report"] = rf"""
WITH per_doc AS (
  SELECT lang, source,
    len(string_split_regex(trim(text), '\s+')) AS n_toks,
    n_chars,
    CAST(count(*) OVER (PARTITION BY md5({NORM_TEXT})) > 1 AS INTEGER) AS is_dup
  FROM documents
)
SELECT
  coalesce(lang, 'ALL') AS lang,
  coalesce(source, 'ALL') AS source,
  count(*) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
  round(sum(is_dup) / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
  round(CAST(sum(CAST(n_chars AS DECIMAL(27,6))) AS DOUBLE) / count(*), 6) AS mean_chars
FROM per_doc
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""


ORACLES["bpe_first_merges"] = r"""
WITH words AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w FROM documents
), vocab AS (
  SELECT w, count(*) AS n FROM words GROUP BY w
), pairs AS (
  SELECT unnest([struct_pack(a := cs[i], b := cs[i+1]) for i in range(1, len(cs))]) AS p, n
  FROM (SELECT regexp_extract_all(w, '.') AS cs, n FROM vocab)
), counts AS (
  SELECT p.a AS a, p.b AS b, sum(n) AS cnt FROM pairs GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) AS INTEGER) AS rank,
  a, b, CAST(cnt AS BIGINT) AS cnt
FROM counts
QUALIFY rank <= 30
"""


# aHash over the synthetic BMPs: row i is a constant-color row with
# integer gray sum v_i; sampled 8x8 grid repeats each row 8 times, so
# the grid mean is list_sum(v)/8.0 (exact /2^3) and each hash byte is
# ff/00 by v_i > mean.  BMPs store rows BOTTOM-UP, so decoded row i is
# file row 7-i: MSB-first packing puts v_0 (file row 0) first.
ORACLES["multimodal_image_ahash"] = """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
    [((doc_id*3 + i) % 256) + ((n_chars + 2*i) % 256) + ((doc_id + i) % 256)
     for i in range(0, 8)] AS vs
  FROM documents
)
SELECT media_id,
  array_to_string(
    [CASE WHEN vs[k] > list_sum(vs) / 8.0 THEN 'ff' ELSE '00' END
     for k in range(1, 9)], '') AS ahash
FROM v
"""


# The PNG query encodes the SAME per-row gradient pixels as the BMP
# aHash (channel order differs; the hash uses the r+g+b SUM, which is
# order-free), so the roundtrip contract is: deflate+filter encode then
# inflate+unfilter decode must reproduce exactly the arithmetic image.
ORACLES["multimodal_png_ahash"] = ORACLES["multimodal_image_ahash"]

# 8x64 grayscale, eight flat 8x8 blocks; flat blocks roundtrip the
# baseline JPEG pixel-exactly, so the decoded block value is the
# formula itself.  Grid rows are identical -> every hash byte equals
# the column byte; strict-> comparison 8*g > sum(g) is the integer-
# exact form of cell > grid-mean.
ORACLES["multimodal_jpeg_ahash"] = """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
    [(doc_id*37 + n_chars + j*59) % 256 for j in range(0, 8)] AS g
  FROM documents
)
SELECT media_id,
  repeat(printf('%02x', CAST(list_sum(
    [CASE WHEN 8*g[j+1] > list_sum(g) THEN 1<<j ELSE 0 END
     for j in range(0, 8)]) AS INTEGER)), 8) AS ahash
FROM v
"""


# 1024 samples per doc: the stored 16-bit word is (doc_id*7 + t*13) %
# 65536, decoded as two's-complement int16; 4 windows of 256; integer
# sum of squares.
ORACLES["multimodal_adpcm_energy"] = """
WITH RECURSIVE dec AS (
  -- replay the IMA-ADPCM decoder state machine per doc: state is
  -- (pred, idx); nibble t is (doc_id*13 + t*7) % 16; the step/index
  -- tables are the standard IMA constants inlined below
  SELECT doc_id, -1 AS t, 0 AS pred, 0 AS idx FROM documents
  UNION ALL
  SELECT doc_id, t,
         CAST(GREATEST(-32768, LEAST(32767,
              pred + CASE WHEN nib >= 8 THEN -delta ELSE delta END)) AS INT),
         CAST(GREATEST(0, LEAST(88, idx +
              CASE WHEN (nib & 7) = 4 THEN 2 WHEN (nib & 7) = 5 THEN 4
                   WHEN (nib & 7) = 6 THEN 6 WHEN (nib & 7) = 7 THEN 8
                   ELSE -1 END)) AS INT)
  FROM (
    SELECT doc_id, t, pred, idx, nib,
           (step >> 3)
           + CASE WHEN (nib & 4) > 0 THEN step ELSE 0 END
           + CASE WHEN (nib & 2) > 0 THEN step >> 1 ELSE 0 END
           + CASE WHEN (nib & 1) > 0 THEN step >> 2 ELSE 0 END AS delta
    FROM (
      SELECT doc_id, t + 1 AS t, pred, idx,
             CAST((doc_id * 13 + (t + 1) * 7) % 16 AS INT) AS nib,
             ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,
               50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,
               230,253,279,307,337,371,408,449,494,544,598,658,724,796,
               876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,
               2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,
               7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,
               20350,22385,24623,27086,29794,32767])[idx + 1] AS step
      FROM dec WHERE t < 255
    )
  )
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(t // 64 AS INT) AS win,
       CAST(SUM(CAST(pred AS BIGINT) * pred) AS BIGINT) AS sumsq
FROM dec WHERE t >= 0
GROUP BY 1, 2
"""


ORACLES["multimodal_audio_energy"] = """
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id, doc_id, unnest(range(0, 4)) AS win
  FROM documents
)
SELECT media_id, CAST(win AS INTEGER) AS win,
  CAST(list_sum(list_transform(
    [((doc_id*7 + (win*256 + k)*13) % 65536 + 32768) % 65536 - 32768
     for k in range(0, 256)],
    v -> v * v)) AS BIGINT) AS sumsq
FROM t
"""


ORACLES["dedup_images_ahash"] = """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
    [((doc_id*3 + i) % 256) + ((n_chars + 2*i) % 256) + ((doc_id + i) % 256)
     for i in range(0, 8)] AS vs
  FROM documents
), h AS (
  SELECT media_id,
    array_to_string(
      [CASE WHEN vs[k] > list_sum(vs) / 8.0 THEN 'ff' ELSE '00' END
       for k in range(1, 9)], '') AS ahash
  FROM v
)
SELECT media_id, ahash FROM h
QUALIFY row_number() OVER (PARTITION BY ahash ORDER BY media_id) = 1
"""


ORACLES["export_manifest_shards"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
), w AS (
  SELECT doc_id, tk,
    unnest(range(0, greatest(CAST(ceil((len(tk) - 64) / 48.0) AS BIGINT), 0) + 1)) AS w
  FROM t
), chunks AS (
  SELECT doc_id,
    len(list_slice(tk, w*48 + 1, w*48 + 64)) AS n_tokens,
    md5(array_to_string(list_slice(tk, w*48 + 1, w*48 + 64), ' ')) AS chunk_md5
  FROM w
)
SELECT CAST(doc_id % 8 AS INTEGER) AS shard,
  count(*) AS n_chunks,
  count(DISTINCT doc_id) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  min(chunk_md5) AS content_digest
FROM chunks GROUP BY 1
"""


ORACLES["full_outer_user_reconciliation"] = """
WITH ev AS (SELECT user_id AS eu, count(*) AS n_events FROM events GROUP BY 1),
od AS (SELECT o_custkey AS ou, count(*) AS n_orders FROM orders GROUP BY 1)
SELECT coalesce(eu, ou) AS user_id, n_events, n_orders,
  CASE WHEN eu IS NULL THEN 'orders_only'
       WHEN ou IS NULL THEN 'events_only'
       ELSE 'both' END AS status
FROM ev FULL OUTER JOIN od ON eu = ou
"""


# --- Round 5b: corpus curation depth + physical layout + binned ranges ---

ORACLES["gopher_quality_flags"] = r"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
), m AS (
  SELECT doc_id, lang,
    CAST(len(toks) AS BIGINT) AS n,
    CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE) AS sum_len,
    CAST(len(list_intersect(toks, ['the','a','of','to','and','is','in'])) AS DOUBLE) AS stop_hits,
    CAST(len(list_filter(toks, x -> len(x) >= 3)) AS DOUBLE) AS n_long,
    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) AS n_alpha
  FROM t
)
SELECT doc_id, lang, n AS n_toks,
  round(sum_len / n, 6) AS mean_word_len,
  round(stop_hits / 7.0, 6) AS stop_hit_frac,
  round(n_long / n, 6) AS long_word_frac,
  round(n_alpha / n, 6) AS alpha_word_frac,
  (n >= 50 AND n <= 100000) AS ok_n_toks,
  (sum_len / n >= 3.0 AND sum_len / n <= 10.0) AS ok_mean_len,
  (stop_hits / 7.0 >= 2.0 / 7.0) AS ok_stopwords,
  (n_long / n >= 0.6) AS ok_long_words,
  (n_alpha / n >= 0.8) AS ok_alpha,
  ((n >= 50 AND n <= 100000) AND (sum_len / n >= 3.0 AND sum_len / n <= 10.0)
   AND (stop_hits / 7.0 >= 2.0 / 7.0) AND (n_long / n >= 0.6)
   AND (n_alpha / n >= 0.8)) AS keep
FROM m
"""


ORACLES["boilerplate_shingle_flags"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 4)) AS u(i)
), boiler AS (
  SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df FROM s GROUP BY sh)
  WHERE df >= 3
), j AS (
  SELECT s.doc_id, CASE WHEN boiler.sh IS NULL THEN 0 ELSE 1 END AS b
  FROM s LEFT JOIN boiler ON s.sh = boiler.sh
)
SELECT doc_id,
  count(*) AS n_shingles,
  CAST(sum(b) AS BIGINT) AS n_boiler,
  round(CAST(sum(b) AS DOUBLE) / count(*), 6) AS boiler_frac,
  (CAST(sum(b) AS DOUBLE) / count(*) > 0.05) AS flag_boiler
FROM j GROUP BY doc_id
"""


ORACLES["vocab_oov_rate"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS n,
      row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS r
    FROM tok GROUP BY tok
  ) WHERE r <= 20
), j AS (
  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id, count(*) AS n_toks, CAST(sum(oov) AS BIGINT) AS n_oov,
  round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
FROM j GROUP BY doc_id
"""


ORACLES["ngram_cosine_top_pairs"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS term
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 2)) AS u(i)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM s GROUP BY doc_id, term
), n AS (SELECT count(*) AS n_docs FROM documents),
dfk AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
  HAVING count(*) >= 2
     AND count(*) <= (SELECT greatest(2, CAST(floor(n_docs * 0.05) AS BIGINT)) FROM n)
), w AS (
  SELECT tf.doc_id, tf.term,
    CAST(round(tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / dfk.df), 6)
         AS DECIMAL(18,6)) AS w
  FROM tf JOIN dfk ON tf.term = dfk.term
), norms AS (
  SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(sum(a.w * b.w) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
  round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON dots.doc_a = na.doc_id
JOIN norms nb ON dots.doc_b = nb.doc_id
ORDER BY cosine DESC, doc_a ASC, doc_b ASC
LIMIT 50
"""


ORACLES["closest_pair_levenshtein"] = r"""
WITH blocked AS (
  SELECT doc_id, lang, text,
    string_split_regex(trim(text), '\s+')[1] AS tok1,
    n_chars // 64 AS band
  FROM documents
), pairs AS (
  SELECT a.lang, a.tok1, a.band,
    a.doc_id AS doc_a, b.doc_id AS doc_b,
    levenshtein(substr(a.text, 1, 256), substr(b.text, 1, 256)) AS lev
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.tok1 = b.tok1 AND a.band = b.band
   AND a.doc_id < b.doc_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang, tok1, band ORDER BY lev, doc_a, doc_b) AS rn
  FROM pairs
)
SELECT lang, tok1, band, doc_a, doc_b, lev FROM ranked WHERE rn = 1
"""


ORACLES["contiguous_global_ids"] = """
SELECT doc_id,
  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_id
FROM documents
"""


ORACLES["shuffle_shards_manifest"] = """
WITH h AS (
  SELECT doc_id, md5(doc_id::VARCHAR || ':42') AS hx FROM documents
)
SELECT doc_id,
  CAST(CAST(('0x' || substr(hx, 1, 4)) AS BIGINT) % 8 AS INTEGER) AS shard,
  CAST(row_number() OVER (
    PARTITION BY CAST(('0x' || substr(hx, 1, 4)) AS BIGINT) % 8
    ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos
FROM h
"""


ORACLES["binned_interval_counts"] = f"""
WITH iv AS (
  SELECT CAST(r.range AS BIGINT) AS win_id,
    TIMESTAMP '2024-01-01' + r.range * INTERVAL 6 HOUR + INTERVAL 17 MINUTE AS ws,
    TIMESTAMP '2024-01-01' + r.range * INTERVAL 6 HOUR + INTERVAL 17 MINUTE
      + INTERVAL 11 HOUR + INTERVAL 30 MINUTE AS we
  FROM range(64) r
)
SELECT win_id, count(*) AS n_events,
  {DSUM.format(x='e.value')} AS sum_value
FROM events e JOIN iv ON e.ts >= iv.ws AND e.ts < iv.we
GROUP BY win_id
"""


# Full BPE pipeline twin: the 20 training iterations unrolled as
# materialized CTEs (pair stats + (cnt desc, a, b) tie-break identical
# to bpe.bpe_train), then the same separator-string replace chain the
# Spark encoder uses (bpe.encode_doc_expr docstring has the argument
# for replace == left-to-right non-overlapping merge).  Generated by
# scripts/gen_bpe_oracle logic inlined here as a literal for auditability.
ORACLES["bpe_encode_corpus"] = r"""
WITH w0 AS MATERIALIZED (
  SELECT regexp_replace(w, '(.)', '\1', 'g') AS s, n
  FROM (SELECT tok AS w, count(*) AS n FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents) GROUP BY tok)
),
p1 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w0) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w1 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p1),
                    (SELECT '' || a || b || '' FROM p1)) AS s, n
  FROM w0
),
p2 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w1) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w2 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p2),
                    (SELECT '' || a || b || '' FROM p2)) AS s, n
  FROM w1
),
p3 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w2) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w3 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p3),
                    (SELECT '' || a || b || '' FROM p3)) AS s, n
  FROM w2
),
p4 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w3) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w4 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p4),
                    (SELECT '' || a || b || '' FROM p4)) AS s, n
  FROM w3
),
p5 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w4) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w5 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p5),
                    (SELECT '' || a || b || '' FROM p5)) AS s, n
  FROM w4
),
p6 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w5) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w6 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p6),
                    (SELECT '' || a || b || '' FROM p6)) AS s, n
  FROM w5
),
p7 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w6) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w7 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p7),
                    (SELECT '' || a || b || '' FROM p7)) AS s, n
  FROM w6
),
p8 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w7) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w8 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p8),
                    (SELECT '' || a || b || '' FROM p8)) AS s, n
  FROM w7
),
p9 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w8) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w9 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p9),
                    (SELECT '' || a || b || '' FROM p9)) AS s, n
  FROM w8
),
p10 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w9) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w10 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p10),
                    (SELECT '' || a || b || '' FROM p10)) AS s, n
  FROM w9
),
p11 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w10) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w11 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p11),
                    (SELECT '' || a || b || '' FROM p11)) AS s, n
  FROM w10
),
p12 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w11) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w12 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p12),
                    (SELECT '' || a || b || '' FROM p12)) AS s, n
  FROM w11
),
p13 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w12) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w13 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p13),
                    (SELECT '' || a || b || '' FROM p13)) AS s, n
  FROM w12
),
p14 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w13) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w14 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p14),
                    (SELECT '' || a || b || '' FROM p14)) AS s, n
  FROM w13
),
p15 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w14) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w15 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p15),
                    (SELECT '' || a || b || '' FROM p15)) AS s, n
  FROM w14
),
p16 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w15) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w16 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p16),
                    (SELECT '' || a || b || '' FROM p16)) AS s, n
  FROM w15
),
p17 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w16) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w17 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p17),
                    (SELECT '' || a || b || '' FROM p17)) AS s, n
  FROM w16
),
p18 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w17) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w18 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p18),
                    (SELECT '' || a || b || '' FROM p18)) AS s, n
  FROM w17
),
p19 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w18) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w19 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p19),
                    (SELECT '' || a || b || '' FROM p19)) AS s, n
  FROM w18
),
p20 AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(s, ''), '') AS syms, n FROM w19) t,
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w20 AS MATERIALIZED (
  SELECT replace(s, (SELECT '' || a || '' || b || '' FROM p20),
                    (SELECT '' || a || b || '' FROM p20)) AS s, n
  FROM w19
)
SELECT doc_id,
  CAST((len(e) - len(replace(e, '', ''))) // 2 AS BIGINT) AS n_bpe_tokens,
  md5(e) AS enc_md5
FROM (SELECT doc_id, replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(regexp_replace(lower(text), '([^ ])', '\1', 'g'),
    (SELECT '' || a || '' || b || '' FROM p1), (SELECT '' || a || b || '' FROM p1)),
    (SELECT '' || a || '' || b || '' FROM p2), (SELECT '' || a || b || '' FROM p2)),
    (SELECT '' || a || '' || b || '' FROM p3), (SELECT '' || a || b || '' FROM p3)),
    (SELECT '' || a || '' || b || '' FROM p4), (SELECT '' || a || b || '' FROM p4)),
    (SELECT '' || a || '' || b || '' FROM p5), (SELECT '' || a || b || '' FROM p5)),
    (SELECT '' || a || '' || b || '' FROM p6), (SELECT '' || a || b || '' FROM p6)),
    (SELECT '' || a || '' || b || '' FROM p7), (SELECT '' || a || b || '' FROM p7)),
    (SELECT '' || a || '' || b || '' FROM p8), (SELECT '' || a || b || '' FROM p8)),
    (SELECT '' || a || '' || b || '' FROM p9), (SELECT '' || a || b || '' FROM p9)),
    (SELECT '' || a || '' || b || '' FROM p10), (SELECT '' || a || b || '' FROM p10)),
    (SELECT '' || a || '' || b || '' FROM p11), (SELECT '' || a || b || '' FROM p11)),
    (SELECT '' || a || '' || b || '' FROM p12), (SELECT '' || a || b || '' FROM p12)),
    (SELECT '' || a || '' || b || '' FROM p13), (SELECT '' || a || b || '' FROM p13)),
    (SELECT '' || a || '' || b || '' FROM p14), (SELECT '' || a || b || '' FROM p14)),
    (SELECT '' || a || '' || b || '' FROM p15), (SELECT '' || a || b || '' FROM p15)),
    (SELECT '' || a || '' || b || '' FROM p16), (SELECT '' || a || b || '' FROM p16)),
    (SELECT '' || a || '' || b || '' FROM p17), (SELECT '' || a || b || '' FROM p17)),
    (SELECT '' || a || '' || b || '' FROM p18), (SELECT '' || a || b || '' FROM p18)),
    (SELECT '' || a || '' || b || '' FROM p19), (SELECT '' || a || b || '' FROM p19)),
    (SELECT '' || a || '' || b || '' FROM p20), (SELECT '' || a || b || '' FROM p20)) AS e FROM documents) q
"""


ORACLES["ivf_assign_cells"] = """
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cent AS (
  SELECT label, pos,
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY 1, 2
), dists AS (
  SELECT ex.vec_id, cent.label,
    SUM(CAST((ex.x - cent.c) * (ex.x - cent.c) AS DECIMAL(27,12))) AS d2
  FROM ex JOIN cent ON ex.pos = cent.pos
  GROUP BY 1, 2
), ranked AS (
  SELECT vec_id, label, d2,
    row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
  FROM dists
)
SELECT vec_id, label AS cell, round(CAST(d2 AS DOUBLE), 6) AS dist2
FROM ranked WHERE rn = 1
"""


ORACLES["curriculum_phases"] = r"""
WITH scored AS (
  SELECT doc_id,
    CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
      / len(string_split_regex(trim(text), '\s+')) AS score
  FROM documents
), bounds AS (
  SELECT quantile_cont(score, 1.0/3) AS b1, quantile_cont(score, 2.0/3) AS b2
  FROM scored
)
SELECT doc_id, round(score, 6) AS score,
  CAST(CASE WHEN score <= b1 THEN 0 WHEN score <= b2 THEN 1 ELSE 2 END AS INTEGER) AS phase
FROM scored, bounds
"""


# CMS / Bloom twins: coefficients baked from arith_hash_family(4, seed=5)
# and (3, seed=11) — same md5-arith universal family as the MinHash twin.
ORACLES["cms_token_frequencies"] = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), hx AS (
  SELECT tok, CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 2147483647 AS x FROM toks
), rb AS (
  SELECT tok, u.* FROM hx, LATERAL (VALUES
    (0, (314222*x + 1299786) % 2147483647 % 16),
    (1, (523680*x + 2599507) % 2147483647 % 16),
    (2, (733138*x + 3899228) % 2147483647 % 16),
    (3, (942596*x + 5198949) % 2147483647 % 16)) AS u(row_i, bucket)
), cells AS (
  SELECT row_i, bucket, count(*) AS c FROM rb GROUP BY 1, 2
), exact AS (
  SELECT tok, count(*) AS exact_n FROM toks GROUP BY 1
), probes AS (
  SELECT DISTINCT rb.tok, rb.row_i, rb.bucket FROM rb
), est AS (
  SELECT p.tok, min(cells.c) AS cms_est
  FROM probes p JOIN cells ON p.row_i = cells.row_i AND p.bucket = cells.bucket
  GROUP BY 1
)
SELECT e.tok, e.exact_n, est.cms_est,
  (est.cms_est >= e.exact_n) AS no_undercount,
  (est.cms_est - e.exact_n) AS overcount
FROM exact e JOIN est ON e.tok = est.tok
"""

ORACLES["bloom_decontaminate_check"] = r"""
WITH w AS (
  SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents
), toks AS (
  SELECT source, array_to_string(w[i:i+2], ' ') AS tok
  FROM w, LATERAL unnest(generate_series(1, len(w) - 2)) AS u(i)
), dt AS (
  SELECT DISTINCT tok FROM toks
), hx AS (
  SELECT tok, CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 2147483647 AS x FROM dt
), bits AS (
  SELECT tok, u.bit FROM hx, LATERAL (VALUES
    ((314264*x + 1299864) % 2147483647 % 16384),
    ((523722*x + 2599585) % 2147483647 % 16384),
    ((733180*x + 3899306) % 2147483647 % 16384)) AS u(bit)
), members AS (
  SELECT DISTINCT tok FROM toks WHERE source IN ('src0', 'src1')
), bloom_set AS (
  SELECT DISTINCT b.bit FROM bits b JOIN members m ON b.tok = m.tok
), verdict AS (
  SELECT bits.tok,
    (count(*) = sum(CASE WHEN bs.bit IS NULL THEN 0 ELSE 1 END)) AS in_bloom
  FROM bits LEFT JOIN bloom_set bs ON bits.bit = bs.bit
  GROUP BY 1
)
SELECT v.tok,
  (m.tok IS NOT NULL) AS in_exact,
  v.in_bloom,
  (m.tok IS NULL OR v.in_bloom) AS no_false_negative,
  (v.in_bloom AND m.tok IS NULL) AS false_positive
FROM verdict v LEFT JOIN members m ON v.tok = m.tok
"""


# PageRank twin: six power iterations unrolled as materialized CTEs
# over the trigram-cosine similarity graph; per-iteration contributions
# quantized to DECIMAL(27,12) pre-sum, exactly as doc_centrality_pagerank.
ORACLES["doc_centrality_pagerank"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS term
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 2)) AS u(i)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM s GROUP BY doc_id, term
), n AS (SELECT count(*) AS n_docs FROM documents),
dfk AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
  HAVING count(*) >= 2
     AND count(*) <= (SELECT greatest(2, CAST(floor(n_docs * 0.05) AS BIGINT)) FROM n)
), w AS (
  SELECT tf.doc_id, tf.term,
    CAST(round(tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / dfk.df), 6)
         AS DECIMAL(18,6)) AS w
  FROM tf JOIN dfk ON tf.term = dfk.term
), norms AS (
  SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(sum(a.w * b.w) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), sim AS MATERIALIZED (
  SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON dots.doc_a = na.doc_id
  JOIN norms nb ON dots.doc_b = nb.doc_id
), e0 AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM sim WHERE cosine >= 0.05
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM sim WHERE cosine >= 0.05
), deg AS MATERIALIZED (
  SELECT src, count(*) AS deg FROM e0 GROUP BY src
), nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
r0 AS MATERIALIZED (
  SELECT src, deg, 1.0 / (SELECT n FROM nn) AS rank FROM deg
),
c1 AS MATERIALIZED (
  SELECT e.dst, CAST(sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(27,12))) AS DOUBLE) AS inflow
  FROM e0 e JOIN r0 r ON e.src = r.src GROUP BY e.dst
), r1 AS MATERIALIZED (
  SELECT d.src, d.deg,
    ((1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.inflow, 0.0)) AS rank
  FROM deg d LEFT JOIN c1 c ON d.src = c.dst
),
c2 AS MATERIALIZED (
  SELECT e.dst, CAST(sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(27,12))) AS DOUBLE) AS inflow
  FROM e0 e JOIN r1 r ON e.src = r.src GROUP BY e.dst
), r2 AS MATERIALIZED (
  SELECT d.src, d.deg,
    ((1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.inflow, 0.0)) AS rank
  FROM deg d LEFT JOIN c2 c ON d.src = c.dst
),
c3 AS MATERIALIZED (
  SELECT e.dst, CAST(sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(27,12))) AS DOUBLE) AS inflow
  FROM e0 e JOIN r2 r ON e.src = r.src GROUP BY e.dst
), r3 AS MATERIALIZED (
  SELECT d.src, d.deg,
    ((1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.inflow, 0.0)) AS rank
  FROM deg d LEFT JOIN c3 c ON d.src = c.dst
),
c4 AS MATERIALIZED (
  SELECT e.dst, CAST(sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(27,12))) AS DOUBLE) AS inflow
  FROM e0 e JOIN r3 r ON e.src = r.src GROUP BY e.dst
), r4 AS MATERIALIZED (
  SELECT d.src, d.deg,
    ((1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.inflow, 0.0)) AS rank
  FROM deg d LEFT JOIN c4 c ON d.src = c.dst
),
c5 AS MATERIALIZED (
  SELECT e.dst, CAST(sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(27,12))) AS DOUBLE) AS inflow
  FROM e0 e JOIN r4 r ON e.src = r.src GROUP BY e.dst
), r5 AS MATERIALIZED (
  SELECT d.src, d.deg,
    ((1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.inflow, 0.0)) AS rank
  FROM deg d LEFT JOIN c5 c ON d.src = c.dst
),
c6 AS MATERIALIZED (
  SELECT e.dst, CAST(sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(27,12))) AS DOUBLE) AS inflow
  FROM e0 e JOIN r5 r ON e.src = r.src GROUP BY e.dst
), r6 AS MATERIALIZED (
  SELECT d.src, d.deg,
    ((1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.inflow, 0.0)) AS rank
  FROM deg d LEFT JOIN c6 c ON d.src = c.dst
)
SELECT src AS doc_id, deg, round(rank, 9) AS rank FROM r6
"""


# Left-outer stream-stream join: thanks to the sentinel-slice watermark
# flush (see the query docstring) the drained stream equals the PLAIN
# batch left join — no cutoff carve-outs.
ORACLES["streaming_left_outer_join"] = """
WITH v AS (
  SELECT event_id AS view_id, user_id, ts AS ts_v FROM events
  WHERE event_type = 'view'
), p AS (
  SELECT event_id AS purchase_id, user_id AS up, ts AS ts_p, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT view_id, v.user_id, purchase_id, purchase_value,
  (purchase_id IS NOT NULL) AS matched
FROM v LEFT JOIN p
  ON v.user_id = p.up AND p.ts_p >= v.ts_v AND p.ts_p <= v.ts_v + INTERVAL 1 HOUR
"""


ORACLES["streaming_full_outer_join"] = """
WITH v AS (
  SELECT event_id AS view_id, user_id, ts AS ts_v FROM events
  WHERE event_type = 'view'
), p AS (
  SELECT event_id AS purchase_id, user_id AS up, ts AS ts_p, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT view_id, COALESCE(v.user_id, p.up) AS user_id, purchase_id, purchase_value,
  (view_id IS NOT NULL AND purchase_id IS NOT NULL) AS matched
FROM v FULL JOIN p
  ON v.user_id = p.up AND p.ts_p >= v.ts_v AND p.ts_p <= v.ts_v + INTERVAL 1 HOUR
"""


# Exact prefix-filtered similarity join: the oracle skips the prefix
# optimization (it only affects WHICH candidates are examined, never
# the result) and computes the exact Jaccard join directly.
ORACLES["jaccard_exact_prefix_join"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 4)) AS u(i)
), sz AS (
  SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter,
  CAST(sa.n + sb.n - i AS BIGINT) AS u,
  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sz sa ON inter.doc_a = sa.doc_id
JOIN sz sb ON inter.doc_b = sb.doc_id
WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.8
"""


ORACLES["funnel_3step_batch"] = """
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS ts_v FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS ts_c FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id AS purchase_id, ts AS ts_p FROM events WHERE event_type = 'purchase'
), vcp AS (
  SELECT v.user_id, view_id, click_id, purchase_id, ts_v, ts_c, ts_p,
    row_number() OVER (PARTITION BY v.user_id
      ORDER BY ts_v, view_id, ts_c, click_id, ts_p, purchase_id) AS rn
  FROM v
  JOIN c ON v.user_id = c.user_id
        AND c.ts_c > v.ts_v AND c.ts_c < v.ts_v + INTERVAL 6 HOUR
  JOIN p ON v.user_id = p.user_id
        AND p.ts_p > ts_c AND p.ts_p <= v.ts_v + INTERVAL 6 HOUR
)
SELECT user_id, view_id, click_id, purchase_id,
  epoch_us(ts_p) - epoch_us(ts_v) AS micros_to_convert
FROM vcp WHERE rn = 1
"""


ORACLES["pivot_priority_by_year"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p_urgent,
  CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p_high,
  CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p_medium,
  CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p_notspec,
  CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p_low
FROM orders GROUP BY 1
"""


ORACLES["cube_pricing_lattice"] = f"""
SELECT l_returnflag, l_linestatus,
  {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {_dsum('l_quantity')} AS sum_qty,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


ORACLES["window_funcs_battery"] = """
SELECT o_custkey, o_orderkey,
  lag(o_totalprice) OVER w AS prev_price,
  lead(o_totalprice) OVER w AS next_price,
  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
  nth_value(o_totalprice, 2) OVER wall AS second_price,
  first_value(o_totalprice) OVER wall AS first_price,
  last_value(o_totalprice) OVER wall AS last_price,
  CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
    AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  wall AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


ORACLES["setops_buyer_cohorts"] = """
WITH a AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
), b AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
)
SELECT user_id, 'retained' AS cohort FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT user_id, 'churned' AS cohort FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT user_id, 'new' AS cohort FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
"""


ORACLES["anomaly_daily_spikes"] = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(day AS DATE) AS day, day_value,
  round(CAST(SUM(CAST(day_value AS DECIMAL(27,6))) OVER (PARTITION BY user_id) AS DOUBLE)
        / count(*) OVER (PARTITION BY user_id), 6) AS mean_day_value,
  day_value > 3 * (CAST(SUM(CAST(day_value AS DECIMAL(27,6))) OVER (PARTITION BY user_id) AS DOUBLE)
        / count(*) OVER (PARTITION BY user_id)) AS spike
FROM daily
"""


ORACLES["inverted_index_postings"] = r"""
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
  CAST(sum(tf) AS BIGINT) AS total_tf,
  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term
"""


ORACLES["split_train_val_test"] = r"""
WITH s AS (
  SELECT CASE
      WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
      WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
      ELSE 'test' END AS split,
    len(string_split_regex(trim(text), '\s+')) AS n_toks,
    n_chars
  FROM documents
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS sum_toks,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM s GROUP BY split
"""


ORACLES["retention_cohorts_weekly"] = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT cohort_week,
  CAST(date_diff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_offset,
  CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_active
FROM act JOIN first ON act.user_id = first.user_id
GROUP BY 1, 2
"""


ORACLES["pii_redaction_scrub"] = r"""
WITH raw AS (
  SELECT doc_id,
    'contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com phone 555-'
      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 ' || text AS raw
  FROM documents
), red AS (
  SELECT doc_id, raw,
    regexp_replace(
      regexp_replace(
        regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
      '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
  FROM raw
)
SELECT doc_id,
  CAST(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.-]+')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(raw, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(raw, '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
  CAST(length(redacted) AS BIGINT) AS redacted_len,
  substring(redacted, 1, 80) AS redacted_head
FROM red
"""


ORACLES["url_domain_blocklist"] = """
WITH u AS (
  SELECT doc_id,
    'https://' || source || '-' || CAST(doc_id % 50 AS VARCHAR)
      || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), bl AS (
  SELECT ('src' || CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR) || '.example.com') AS domain
  FROM (VALUES (3), (7), (11)) s(i), (VALUES (0), (13), (26), (39)) t(j)
)
SELECT doc_id, url, regexp_extract(url, 'https?://([^/]+)/', 1) AS domain,
  (bl.domain IS NOT NULL) AS blocked
FROM u LEFT JOIN bl ON regexp_extract(url, 'https?://([^/]+)/', 1) = bl.domain
"""


ORACLES["span_scrub_exact_substrings"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), tokpos AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS tok
  FROM t, LATERAL unnest(generate_series(1, len(toks))) u(i)
), sh AS (
  SELECT doc_id, i - 1 AS start, array_to_string(toks[i:i+4], ' ') AS sh
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 4)) u(i)
), boiler AS (
  SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1)
  WHERE df >= 3
), covered AS (
  SELECT DISTINCT sh.doc_id, sh.start + j.j AS pos
  FROM sh JOIN boiler USING (sh), LATERAL unnest(generate_series(0, 4)) j(j)
), kept AS (
  SELECT tokpos.doc_id, tokpos.pos, tokpos.tok FROM tokpos
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = tokpos.doc_id AND c.pos = tokpos.pos
  )
), rebuilt AS (
  SELECT doc_id, count(*) AS n_kept, string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_toks,
  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(len(t.toks) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
  md5(coalesce(r.cleaned, '')) AS cleaned_md5
FROM t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


ORACLES["phrase_search_positions"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), sh AS (
  SELECT doc_id, i - 1 AS match_pos, array_to_string(toks[i:i+2], ' ') AS g
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 2)) u(i)
)
SELECT doc_id, CAST(match_pos AS BIGINT) AS match_pos
FROM sh WHERE g = 'the fast query'
"""


ORACLES["graph_triangle_rare_shingles"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 4)) u(i)
), rare AS (
  SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df FROM s GROUP BY 1)
  WHERE df = 2
), edges AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM s a JOIN rare USING (sh) JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri) GROUP BY doc_id
"""


ORACLES["repetition_signals"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), bi AS (
  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g, count(*) AS c
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) u(i)
  GROUP BY 1, 2
), tri AS (
  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g, count(*) AS c
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 2)) u(i)
  GROUP BY 1, 2
), bs AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bi, CAST(sum(c) AS BIGINT) AS n_bi
  FROM bi GROUP BY doc_id
), ts AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_tri,
    CAST(sum(c) AS BIGINT) AS n_tri
  FROM tri GROUP BY doc_id
)
SELECT bs.doc_id, top_bi AS top_bigram_count, n_bi,
  round(CAST(top_bi AS DOUBLE) / n_bi, 6) AS top_bigram_frac,
  dup_tri, n_tri,
  round(CAST(dup_tri AS DOUBLE) / n_tri, 6) AS dup_trigram_frac,
  (CAST(top_bi AS DOUBLE) / n_bi > 0.18 OR CAST(dup_tri AS DOUBLE) / n_tri > 0.30)
    AS flag_repetitive
FROM bs JOIN ts ON bs.doc_id = ts.doc_id
"""


ORACLES["text_formats_roundtrip"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(count(*) AS BIGINT) AS n_identical
FROM documents GROUP BY lang
"""


# same accounting straight off the parquet table: n_identical == n_docs
# is the ORC round-trip fidelity claim the hash gate enforces
ORACLES["orc_format_roundtrip"] = ORACLES["text_formats_roundtrip"]


ORACLES["minhash_estimate_error"] = f"""
WITH hx AS (
  SELECT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) % 2147483647 AS x
  FROM (SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s FROM documents)
), m AS (
  SELECT doc_id,
    min((314187*x + 1299721) % 2147483647) AS m0,
    min((523645*x + 2599442) % 2147483647) AS m1,
    min((733103*x + 3899163) % 2147483647) AS m2,
    min((942561*x + 5198884) % 2147483647) AS m3,
    min((1152019*x + 6498605) % 2147483647) AS m4,
    min((1361477*x + 7798326) % 2147483647) AS m5,
    min((1570935*x + 9098047) % 2147483647) AS m6,
    min((1780393*x + 10397768) % 2147483647) AS m7,
    min((1989851*x + 11697489) % 2147483647) AS m8,
    min((2199309*x + 12997210) % 2147483647) AS m9,
    min((2408767*x + 14296931) % 2147483647) AS m10,
    min((2618225*x + 15596652) % 2147483647) AS m11,
    min((2827683*x + 16896373) % 2147483647) AS m12,
    min((3037141*x + 18196094) % 2147483647) AS m13,
    min((3246599*x + 19495815) % 2147483647) AS m14,
    min((3456057*x + 20795536) % 2147483647) AS m15
  FROM hx GROUP BY doc_id
), bands AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, CAST({b} AS VARCHAR) || '_' || CAST(m{2*b} AS VARCHAR)"
    f" || '_' || CAST(m{2*b+1} AS VARCHAR) AS bk FROM m"
    for b in range(8)
  )}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
), est AS (
  SELECT doc_a, doc_b,
    ({" + ".join(f"CAST(ma.m{i} = mb.m{i} AS INT)" for i in range(16))}) / 16.0
      AS est_jaccard
  FROM cand JOIN m ma ON cand.doc_a = ma.doc_id
            JOIN m mb ON cand.doc_b = mb.doc_id
), sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s FROM documents
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT cand.doc_a, cand.doc_b, count(*) AS i
  FROM cand
  JOIN sh a ON a.doc_id = cand.doc_a
  JOIN sh b ON b.doc_id = cand.doc_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT est.doc_a, est.doc_b,
  round(est_jaccard, 6) AS est_jaccard,
  round(CAST(coalesce(i, 0) AS DOUBLE) / (sa.n + sb.n - coalesce(i, 0)), 6)
    AS true_jaccard,
  round(abs(round(est_jaccard, 6)
    - round(CAST(coalesce(i, 0) AS DOUBLE) / (sa.n + sb.n - coalesce(i, 0)), 6)), 6)
    AS abs_err
FROM est
LEFT JOIN inter ON est.doc_a = inter.doc_a AND est.doc_b = inter.doc_b
JOIN sz sa ON est.doc_a = sa.doc_id
JOIN sz sb ON est.doc_b = sb.doc_id
"""


ORACLES["asof_next_event"] = """
WITH x AS (
  SELECT user_id, event_id, ts, event_type,
    min(CASE WHEN event_type = 'view' THEN ts END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
  FROM events
)
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
  CASE WHEN epoch_us(nv) - epoch_us(ts) <= 3600000000 THEN nv END AS next_view_ts,
  CASE WHEN epoch_us(nv) - epoch_us(ts) <= 3600000000
       THEN epoch_us(nv) - epoch_us(ts) END AS micros_to_next_view
FROM x WHERE event_type = 'purchase'
"""


ORACLES["graph_bfs_hops"] = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 4)) u(i)
), rare AS (
  SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df FROM s GROUP BY 1)
  WHERE df = 2
), edges AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM s a JOIN rare USING (sh) JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
), und AS (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
), bfs AS (
  SELECT doc_id, 0 AS dist FROM documents WHERE doc_id % 100 = 0
  UNION
  SELECT und.v AS doc_id, bfs.dist + 1 AS dist
  FROM bfs JOIN und ON bfs.doc_id = und.u WHERE bfs.dist < 3
)
SELECT doc_id, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY doc_id
"""


ORACLES["bm25_search_scores"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
  WHERE term IN ('table', 'merge', 'window') GROUP BY 1, 2
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), comp AS (
  SELECT tf.doc_id,
    round(
      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      * (tf * 2.2)
      / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))), 6) AS comp
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
  CAST(SUM(CAST(comp AS DECIMAL(27,6))) AS DOUBLE) AS bm25
FROM comp GROUP BY doc_id
"""


ORACLES["markov_event_transitions"] = """
WITH pairs AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), c AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM pairs
  WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""


ORACLES["near_dup_cluster_stats"] = f"""
WITH base AS ({ORACLES["connected_components_jaccard"]}),
sizes AS (
  SELECT comp, count(*) AS cluster_size FROM base GROUP BY comp
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(sum(cluster_size - 1) AS BIGINT) AS n_removable
FROM sizes GROUP BY 1
"""


ORACLES["stats_corr_regression"] = f"""
WITH g AS (
  SELECT l_returnflag, l_linestatus,
    CAST(count(*) AS BIGINT) AS n,
    {_dsum('l_discount')} AS sx,
    {_dsum('l_quantity')} AS sy,
    {_dsum('round(l_discount * l_quantity, 6)')} AS sxy,
    {_dsum('round(l_discount * l_discount, 6)')} AS sxx,
    {_dsum('round(l_quantity * l_quantity, 6)')} AS syy
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n,
  round((sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
    AS pearson_r,
  round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS ols_slope,
  round(sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sx / n), 6)
    AS ols_intercept
FROM g
"""


ORACLES["schema_evolution_union"] = f"""
WITH merged AS (
  SELECT o_orderkey, o_custkey, o_totalprice, 'UNKNOWN' AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
  {_dsum('o_totalprice')} AS sum_price
FROM merged GROUP BY 1
"""


ORACLES["langid_confusion_matrix"] = f"""
WITH t AS (
  SELECT doc_id, lang,
    {_lang_scores}
  FROM documents
), m AS (
  SELECT *, greatest(s_de, s_en, s_es, s_fr) AS best FROM t
), p AS (
  SELECT lang, {_lang_case()} AS lang_pred FROM m
), c AS (
  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2
)
SELECT lang, lang_pred, n,
  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang), 6) AS frac_of_declared,
  (lang = lang_pred) AS is_correct
FROM c
"""


ORACLES["winsorize_event_values"] = """
WITH b AS (
  SELECT event_type,
    round(quantile_cont(value, 0.01), 6) AS lo,
    round(quantile_cont(value, 0.99), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value, lo, hi,
  least(greatest(value, lo), hi) AS clipped,
  (value < lo OR value > hi) AS was_clipped
FROM events e JOIN b ON e.event_type = b.event_type
"""


ORACLES["debounce_user_events"] = """
SELECT event_id, user_id, event_type, ts,
  coalesce(
    epoch_us(ts) - epoch_us(lag(ts) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id)) >= 300000000,
    TRUE) AS kept
FROM events
"""


ORACLES["embedding_outlier_screen"] = """
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
    CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cent AS (
  SELECT label, pos,
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, pos
), j AS (
  SELECT ex.vec_id, ex.label,
    CAST(SUM(CAST(round(x * c, 6) AS DECIMAL(27,6))) AS DOUBLE) AS dot,
    CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(27,6))) AS DOUBLE) AS v2,
    CAST(SUM(CAST(round(c * c, 6) AS DECIMAL(27,6))) AS DOUBLE) AS c2
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY 1, 2
)
SELECT vec_id, label,
  round(dot / (sqrt(v2) * sqrt(c2)), 6) AS cos_to_centroid,
  (dot / (sqrt(v2) * sqrt(c2)) < 0.5) AS flag_outlier
FROM j
"""


ORACLES["unicode_nfc_normalize"] = """
WITH r AS (
  SELECT doc_id, 'cafe' || chr(769) || ' ' || text AS raw FROM documents
)
SELECT doc_id,
  CAST(length(raw) AS BIGINT) AS len_raw,
  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
  md5(nfc_normalize(raw)) AS nfc_md5,
  (length(raw) != length(nfc_normalize(raw))) AS changed
FROM r
"""


# URL canonicalization + exact-URL dedup: the raw-URL derivation and
# the regexp canonicalization chain are replicated verbatim (Java/RE2
# common-subset patterns; DuckDB regexp_replace needs explicit 'g'
# where a pattern can match twice — Spark's is always global).
ORACLES["url_canonical_dedup"] = """
WITH r AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 4 = 0 THEN upper(source || '.Example.COM')
             ELSE source || '.Example.COM' END)
    || '/p/' || CAST(doc_id % 40 AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
             THEN '?utm_source=feed&utm_campaign=c&id=' || CAST(doc_id % 6 AS VARCHAR)
             WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 6 AS VARCHAR)
             ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '#sec-2' ELSE '' END) AS raw
  FROM documents
), canon AS (
  SELECT doc_id, raw,
    regexp_replace(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lower(regexp_extract(raw, '^[^/]+//[^/]+'))
              || regexp_replace(raw, '^[^/]+//[^/]+', ''),
            '#.*$', ''),
          'utm_[a-z]+=[^&#]*&', '', 'g'),
        '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
      '/[?]', '?'), '/$', '') AS canonical_url
  FROM r
)
SELECT canonical_url, min(doc_id) AS keep_doc_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT raw) AS BIGINT) AS n_raw_forms
FROM canon GROUP BY canonical_url
"""


# Quality-aware survivor policy over the gated arith-band CC machinery:
# reuse the band/star/closure CTEs verbatim and swap the min-id drop
# for an argmax(n_chars, doc_id) window per cluster (singletons =
# their own cluster via the LEFT JOIN coalesce).
ORACLES["dedup_cc_best_quality_survivors"] = (
    ORACLES["dedup_minhash_arith_cc_survivors"]
    .split("), dropped AS")[0]
    + """), lab AS (
  SELECT d.doc_id, d.n_chars, coalesce(c.comp, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
), ranked AS (
  SELECT doc_id, cluster, n_chars,
    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS comp_size,
    row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn
  FROM lab
)
SELECT doc_id, cluster, comp_size, n_chars FROM ranked WHERE rn = 1
"""
)


# Leakage-safe split: same gated cluster labeling, then the
# split_train_test_hash md5-cutoff recipe applied to the CLUSTER id.
ORACLES["split_leakage_safe_by_cluster"] = (
    ORACLES["dedup_minhash_arith_cc_survivors"]
    .split("), dropped AS")[0]
    + """), lab AS (
  SELECT d.doc_id, d.source, coalesce(c.comp, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT CASE WHEN md5(CAST(cluster AS VARCHAR)) < 'cccc' THEN 'train' ELSE 'test' END AS split,
  source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
FROM lab GROUP BY 1, 2
"""
)


# sqrt is IEEE-correctly-rounded => bit-identical cross-engine; the
# weight accumulates in DECIMAL so the normalizing total is
# order-independent.  DuckDB SUM(BIGINT) -> HUGEINT, hence the cast.
ORACLES["domain_mixture_weights"] = """
WITH per AS (
  SELECT source || '.example.com' AS domain,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
    CAST(round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
  FROM documents GROUP BY source
), tot AS (SELECT sum(w) AS tw FROM per)
SELECT domain, n_docs, sum_chars,
  CAST(w AS DOUBLE) AS sqrt_weight,
  round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS weight_share
FROM per CROSS JOIN tot
"""


# Integer-exact rarity scoring: row_number/sum/ntile only, no
# transcendentals.  DuckDB row_number and ntile are BIGINT (Spark INT)
# and SUM(BIGINT) is HUGEINT — cast at the output boundary.
ORACLES["ccnet_rarity_buckets"] = r"""
WITH toks AS (
  SELECT doc_id, lang,
    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), ranked AS (
  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM vocab
), scored AS (
  SELECT doc_id, lang,
    CAST(sum(rank) AS BIGINT) AS rarity,
    CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks JOIN ranked USING (tok)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, rarity, n_tokens,
  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY rarity, doc_id) AS INTEGER) AS bucket
FROM scored
"""


# The atomic-group protocol reduces to WHICH slices are visible per
# stage: after the injected epoch-1 crash only slice 0 committed (the
# orphan epoch-1 'agg' directory is marker-gated out); after the
# replay all three.  agg-leaf rows are per-epoch per-type counts, so
# its n_rows is distinct (slice, type) pairs over the visible slices.
ORACLES["atomic_multisink_roundtrip"] = """
WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
s AS (
  SELECT event_id, event_type,
    LEAST((epoch_us(ts) - b.mn) * 3 // (b.mx - b.mn + 1), 2) AS slice
  FROM events, b
)
SELECT 'after_crash' AS stage, 'agg' AS leaf,
  CAST((SELECT count(*) FROM (SELECT DISTINCT slice, event_type FROM s WHERE slice <= 0)) AS BIGINT) AS n_rows,
  CAST((SELECT count(*) FROM s WHERE slice <= 0) AS BIGINT) AS key_sum
UNION ALL
SELECT 'after_crash', 'raw',
  CAST((SELECT count(*) FROM s WHERE slice <= 0) AS BIGINT),
  CAST((SELECT sum(event_id) FROM s WHERE slice <= 0) AS BIGINT)
UNION ALL
SELECT 'final', 'agg',
  CAST((SELECT count(*) FROM (SELECT DISTINCT slice, event_type FROM s)) AS BIGINT),
  CAST((SELECT count(*) FROM s) AS BIGINT)
UNION ALL
SELECT 'final', 'raw',
  CAST((SELECT count(*) FROM s) AS BIGINT),
  CAST((SELECT sum(event_id) FROM s) AS BIGINT)
UNION ALL
-- compaction is a layout change only: the after_compact snapshot must
-- equal the final one row-for-row
SELECT 'after_compact', 'agg',
  CAST((SELECT count(*) FROM (SELECT DISTINCT slice, event_type FROM s)) AS BIGINT),
  CAST((SELECT count(*) FROM s) AS BIGINT)
UNION ALL
SELECT 'after_compact', 'raw',
  CAST((SELECT count(*) FROM s) AS BIGINT),
  CAST((SELECT sum(event_id) FROM s) AS BIGINT)
"""

ORACLES["dedup_span_coverage"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), kg AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s, array_to_string(w[i:i+4], ' ') AS g
  FROM toks, unnest(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), dup AS (
  SELECT g FROM kg GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), spans AS (
  SELECT doc_id, s AS a, s + 4 AS b FROM kg JOIN dup USING (g)
), marked AS (
  SELECT doc_id, a, b,
    CASE WHEN a > COALESCE(MAX(b) OVER (PARTITION BY doc_id ORDER BY a
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_isl
  FROM spans
), numbered AS (
  SELECT *, SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY a
    ROWS UNBOUNDED PRECEDING) AS isl
  FROM marked
), grp AS (
  SELECT doc_id, isl, MIN(a) AS ia, MAX(b) AS ib FROM numbered GROUP BY doc_id, isl
), cov AS (
  SELECT doc_id, CAST(SUM(ib - ia + 1) AS BIGINT) AS covered,
         COUNT(*) AS n_islands, CAST(MAX(ib - ia + 1) AS BIGINT) AS longest
  FROM grp GROUP BY doc_id
), base AS (
  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0
    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT base.doc_id, n_tokens,
  COALESCE(covered, 0) AS dup_covered,
  CASE WHEN n_tokens > 0 THEN COALESCE(covered, 0) / n_tokens ELSE 0.0 END AS coverage_frac,
  COALESCE(n_islands, 0) AS n_islands,
  COALESCE(longest, 0) AS longest_run
FROM base LEFT JOIN cov USING (doc_id)
"""

ORACLES["dedup_span_rewrite"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w[i] AS tk
  FROM toks, unnest(range(1, len(w) + 1)) AS t(i)
), kg AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s, array_to_string(w[i:i+4], ' ') AS g
  FROM toks, unnest(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), dup AS (
  SELECT g, MIN(doc_id) AS owner FROM kg GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), spans AS (
  SELECT kg.doc_id, kg.s AS a, kg.s + 4 AS b
  FROM kg JOIN dup USING (g) WHERE kg.doc_id <> dup.owner
), marked AS (
  SELECT doc_id, a, b,
    CASE WHEN a > COALESCE(MAX(b) OVER (PARTITION BY doc_id ORDER BY a
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_isl
  FROM spans
), numbered AS (
  SELECT *, SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY a
    ROWS UNBOUNDED PRECEDING) AS isl
  FROM marked
), grp AS (
  SELECT doc_id, isl, MIN(a) AS ia, MAX(b) AS ib FROM numbered GROUP BY doc_id, isl
), covpos AS (
  SELECT doc_id, CAST(u.p AS BIGINT) AS p
  FROM grp, unnest(range(ia, ib + 1)) AS u(p)
), kept AS (
  SELECT tok.doc_id, tok.p, tok.tk
  FROM tok LEFT JOIN covpos ON tok.doc_id = covpos.doc_id AND tok.p = covpos.p
  WHERE covpos.p IS NULL
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         md5(string_agg(tk, ' ' ORDER BY p)) AS clean_md5
  FROM kept GROUP BY doc_id
), base AS (
  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0
    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT base.doc_id, n_tokens,
  n_tokens - COALESCE(n_kept, 0) AS n_removed,
  COALESCE(clean_md5, md5('')) AS clean_md5
FROM base LEFT JOIN rebuilt USING (doc_id)
"""

ORACLES["quality_hashed_linear_score"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(w) AS tk FROM toks
), feat AS (
  SELECT doc_id,
    CAST(((instr('0123456789abcdef', substring(md5(tk), 1, 1)) - 1) * 16
        + (instr('0123456789abcdef', substring(md5(tk), 2, 1)) - 1)) % 64 AS BIGINT) AS b
  FROM tok
), wt AS (
  SELECT doc_id,
    ((instr('0123456789abcdef', substring(md5('w' || CAST(b AS VARCHAR)), 1, 1)) - 1) * 256
   + (instr('0123456789abcdef', substring(md5('w' || CAST(b AS VARCHAR)), 2, 1)) - 1) * 16
   + (instr('0123456789abcdef', substring(md5('w' || CAST(b AS VARCHAR)), 3, 1)) - 1)) % 2001
   - 1000 AS wmilli
  FROM feat
), agg AS (
  SELECT doc_id, CAST(SUM(wmilli) AS BIGINT) AS sum_milli, COUNT(*) AS n_tokens
  FROM wt GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_milli,
  round(1.0 / (1.0 + exp(-4.0 * sum_milli / (1000.0 * n_tokens))), 6) AS score,
  CAST(CASE WHEN sum_milli >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep_label
FROM agg
"""

ORACLES["curation_funnel_attribution"] = f"""
WITH t AS (
  SELECT doc_id, text,
    MIN(doc_id) OVER (PARTITION BY {NORM_TEXT}) AS owner
  FROM documents
), r AS (
  SELECT doc_id, owner, string_split_regex(trim(text), '\\s+') AS tk FROM t
), f AS (
  SELECT doc_id, owner,
    len(tk) AS n,
    list_aggregate(list_transform(tk, x -> len(x)), 'sum') * 1.0 / len(tk) AS mean_len,
    len(list_intersect(tk, ['the','a','of','to','and','is','in'])) / 7.0 AS stop_frac,
    len(list_filter(tk, x -> len(x) >= 3)) * 1.0 / len(tk) AS long_frac,
    len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(tk) AS alpha_frac
  FROM r
), m AS (
  SELECT doc_id, owner,
    (CASE WHEN n < 50 THEN 1 ELSE 0 END
   + CASE WHEN n > 100000 THEN 2 ELSE 0 END
   + CASE WHEN mean_len < 3.0 THEN 4 ELSE 0 END
   + CASE WHEN mean_len > 10.0 THEN 8 ELSE 0 END
   + CASE WHEN stop_frac < 2.0/7.0 THEN 16 ELSE 0 END
   + CASE WHEN long_frac < 0.6 THEN 32 ELSE 0 END
   + CASE WHEN alpha_frac < 0.8 THEN 64 ELSE 0 END) AS fail_mask,
    CASE WHEN n < 50 THEN 'too_short'
         WHEN n > 100000 THEN 'too_long'
         WHEN mean_len < 3.0 THEN 'mean_word_len_low'
         WHEN mean_len > 10.0 THEN 'mean_word_len_high'
         WHEN stop_frac < 2.0/7.0 THEN 'low_stopword'
         WHEN long_frac < 0.6 THEN 'short_words'
         WHEN alpha_frac < 0.8 THEN 'low_alpha'
         ELSE '' END AS first_failed_rule
  FROM f
)
SELECT doc_id,
  CASE WHEN doc_id <> owner THEN 'exact_dup'
       WHEN fail_mask > 0 THEN 'quality' ELSE 'kept' END AS stage,
  CAST(CASE WHEN doc_id <> owner THEN owner ELSE -1 END AS BIGINT) AS dup_owner,
  CAST(CASE WHEN doc_id <> owner THEN 0 ELSE fail_mask END AS BIGINT) AS fail_mask,
  CASE WHEN doc_id <> owner THEN '' ELSE first_failed_rule END AS first_failed_rule
FROM m
"""

ORACLES["chunk_content_defined"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
  WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w[i] AS tk
  FROM toks, unnest(range(1, len(w) + 1)) AS t(i)
), marked AS (
  SELECT doc_id, p, tk,
    CASE WHEN p > 0 AND
      CAST(('0x' || substring(md5(
        lag(tk) OVER (PARTITION BY doc_id ORDER BY p) || ' ' || tk
      ), 1, 4)) AS BIGINT) % 8 = 0
    THEN 1 ELSE 0 END AS b
  FROM tok
), numbered AS (
  SELECT doc_id, p, tk,
    SUM(b) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING)
      AS chunk_idx
  FROM marked
), chunks AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
    MIN(p) AS start_pos, COUNT(*) AS n_tokens,
    md5(string_agg(tk, ' ' ORDER BY p)) AS chunk_md5
  FROM numbered GROUP BY doc_id, chunk_idx
), share AS (
  SELECT chunk_md5, COUNT(DISTINCT doc_id) AS n_docs_sharing
  FROM chunks GROUP BY chunk_md5
)
SELECT doc_id, chunk_idx, start_pos, n_tokens, chunk_md5, n_docs_sharing
FROM chunks JOIN share USING (chunk_md5)
"""

ORACLES["pipeline_stage_memoized"] = f"""
WITH surv AS (
  SELECT doc_id, source, n_chars FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY {NORM_TEXT})
), agg AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars_total
  FROM surv GROUP BY source
)
SELECT 'fresh' AS run, * FROM agg
UNION ALL
SELECT 'reused' AS run, * FROM agg
"""


# Round-9: entity resolution — same md5-derived dirty table, blocked
# levenshtein edges, recursive-CTE closure (the oracle twin of
# operators/dedup.py connected_components on a second graph shape).
ORACLES["record_linkage_entities"] = """
WITH RECURSIVE h AS (
  SELECT c_custkey, CAST(('0x' || substring(md5(c_name), 1, 4)) AS BIGINT) AS hv
  FROM customer
), recs AS (
  SELECT c_custkey * 2 AS rec_id, c_name AS name, c_nationkey AS nat,
         c_mktsegment AS seg, c_acctbal AS bal, 0 AS is_dirty
  FROM customer
  UNION ALL
  SELECT c.c_custkey * 2 + 1,
         substring(c_name, 1, 15)
           || CAST((CAST(substring(c_name, 16, 1) AS INTEGER) + 1 + (hv % 8)) % 10 AS VARCHAR)
           || substring(c_name, 17, 2),
         c_nationkey, c_mktsegment, c_acctbal + (hv % 100) / 100.0, 1
  FROM customer c JOIN h ON c.c_custkey = h.c_custkey
  WHERE hv % 2 = 0
), blocked AS (
  -- _LINK_CAP mirror: oversized (nat, seg, suffix) blocks split 16
  -- ways on an md5 digit of the STABLE name prefix (chars 1-15)
  SELECT *,
    CASE WHEN count(*) OVER (PARTITION BY nat, seg, substring(name, 17, 2))
              > 200
         THEN CAST(('0x' || substring(md5(substring(name, 1, 15)), 1, 1))
                   AS INTEGER)
         ELSE -1 END AS blk2
  FROM recs
), edges AS (
  SELECT a.rec_id AS id_a, b.rec_id AS id_b
  FROM blocked a JOIN blocked b
    ON a.nat = b.nat AND a.seg = b.seg
   AND substring(a.name, 17, 2) = substring(b.name, 17, 2)
   AND a.blk2 = b.blk2
   AND a.rec_id < b.rec_id
  WHERE levenshtein(a.name, b.name) <= 2 AND abs(a.bal - b.bal) <= 1.0
), und AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION
  SELECT id_b, id_a FROM edges
), reach AS (
  SELECT src AS node, dst AS r FROM und
  UNION
  SELECT reach.node, und.dst FROM reach JOIN und ON reach.r = und.src
), comp AS (
  SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node
)
SELECT coalesce(comp.comp, recs.rec_id) AS entity_id,
  CAST(count(*) AS BIGINT) AS n_records,
  CAST(sum(is_dirty) AS BIGINT) AS n_dirty,
  CAST(count(DISTINCT rec_id // 2) AS BIGINT) AS n_sources,
  round(max(bal) - min(bal), 2) AS bal_spread
FROM recs LEFT JOIN comp ON recs.rec_id = comp.node
GROUP BY 1
"""


# Round-9: k-anonymity ladder — single-pass conditional windowed
# counts (level-L counts only rows every earlier level failed), the
# same shape as the Spark side: one scan, three windows, no per-level
# union branches.
ORACLES["k_anonymity_generalize"] = """
WITH qi AS (
  SELECT c_custkey, n_name AS nation, r_name AS region, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 100) AS BIGINT) AS b100,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS b1000
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
), g0 AS (
  SELECT *, count(*) OVER (PARTITION BY nation, seg, b100) AS gs0 FROM qi
), g1 AS (
  SELECT *, sum(CASE WHEN gs0 < 5 THEN 1 ELSE 0 END)
              OVER (PARTITION BY nation, seg, b1000) AS gs1
  FROM g0
), g AS (
  SELECT *, sum(CASE WHEN gs0 < 5 AND gs1 < 5 THEN 1 ELSE 0 END)
              OVER (PARTITION BY region, seg, b1000) AS gs2
  FROM g1
), lv AS (
  SELECT *, CASE WHEN gs0 >= 5 THEN 0 WHEN gs1 >= 5 THEN 1
                 WHEN gs2 >= 5 THEN 2 ELSE 3 END AS level
  FROM g
)
SELECT c_custkey, level,
  CAST(CASE WHEN level <= 1 THEN nation WHEN level = 2 THEN region END
       AS VARCHAR) AS qi_geo,
  CAST(CASE WHEN level <= 2 THEN seg END AS VARCHAR) AS qi_seg,
  CAST(CASE WHEN level = 0 THEN b100 WHEN level <= 2 THEN b1000 END
       AS BIGINT) AS qi_band,
  CAST(CASE WHEN level = 0 THEN gs0 WHEN level = 1 THEN gs1
            WHEN level = 2 THEN gs2 ELSE 0 END AS BIGINT) AS group_size
FROM lv
"""


# Round-9: hybrid retrieval + RRF — BM25 leg reuses the proven
# bm25_search_scores float discipline; the QL leg is Dirichlet
# smoothing (mu=100); ranks are ints on decimal-summed rounded scores
# so row_number agrees bit-for-bit across engines.
# shared CTE chain: the two retrieval legs (BM25 + Dirichlet-QL),
# ranked per query -- consumed by rag_hybrid_rrf (fusion) and
# retrieval_eval_metrics (measurement)
_RAG_RANKED = r"""
WITH q(query_id, term) AS (
  VALUES (1, 'table'), (1, 'merge'), (2, 'window'), (2, 'stream'),
         (3, 'filter'), (3, 'join')
), t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
  WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), ctf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1
), comp AS (
  SELECT q.query_id, tf.doc_id,
    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))), 6) AS bc,
    round(ln((tf + 100.0 * (ctf / sum_dl)) / (dl + 100.0)), 6) AS qc
  FROM tf JOIN q USING (term) JOIN df USING (term) JOIN ctf USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats
), scored AS (
  SELECT query_id, doc_id,
    CAST(SUM(CAST(bc AS DECIMAL(27,6))) AS DOUBLE) AS bm25,
    CAST(SUM(CAST(qc AS DECIMAL(27,6))) AS DOUBLE) AS ql
  FROM comp GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id,
    row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS lr,
    row_number() OVER (PARTITION BY query_id ORDER BY ql DESC, doc_id) AS qr
  FROM scored
)"""

ORACLES["rag_hybrid_rrf"] = _RAG_RANKED + r""", fused AS (
  SELECT query_id, doc_id, lr, qr,
    (CASE WHEN lr <= 20 THEN 1.0 / (60 + lr) ELSE 0.0 END)
    + (CASE WHEN qr <= 20 THEN 1.0 / (60 + qr) ELSE 0.0 END) AS rrf
  FROM ranked WHERE lr <= 20 OR qr <= 20
), fr AS (
  SELECT query_id, doc_id, lr, qr, rrf,
    row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS final_rank
  FROM fused
)
SELECT query_id, doc_id,
  CAST(CASE WHEN lr <= 20 THEN lr ELSE 0 END AS INTEGER) AS lex_rank,
  CAST(CASE WHEN qr <= 20 THEN qr ELSE 0 END AS INTEGER) AS ql_rank,
  round(rrf, 6) AS rrf,
  CAST(final_rank AS INTEGER) AS final_rank
FROM fr WHERE final_rank <= 10
"""


ORACLES["lm_stupid_backoff_filter"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2
      AS par
  FROM documents WHERE trim(text) <> ''
), big AS (
  SELECT doc_id, par,
    unnest(w[1:len(w) - 1]) AS prev, unnest(w[2:len(w)]) AS nxt
  FROM d WHERE len(w) >= 2
), cb AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS cb
  FROM big WHERE par = 0 GROUP BY 1, 2
), cc AS (
  SELECT prev, CAST(sum(cb) AS BIGINT) AS cc FROM cb GROUP BY 1
), cu AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cu
  FROM (SELECT unnest(w) AS tok FROM d WHERE par = 0) GROUP BY 1
), n AS (
  SELECT CAST(sum(len(w)) AS BIGINT) AS n FROM d WHERE par = 0
), scored AS (
  SELECT b.doc_id,
    round(CASE
      WHEN cb.cb IS NOT NULL THEN ln(CAST(cb.cb AS DOUBLE) / cc.cc)
      WHEN cu.cu IS NOT NULL THEN ln(0.4 * cu.cu / n.n)
      ELSE ln(0.2 / n.n) END, 6) AS lp
  FROM big b
  LEFT JOIN cb ON b.prev = cb.prev AND b.nxt = cb.nxt
  LEFT JOIN cc ON b.prev = cc.prev
  LEFT JOIN cu ON b.nxt = cu.tok
  CROSS JOIN n
  WHERE b.par = 1
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
    round(CAST(sum(CAST(lp AS DECIMAL(27,6))) AS DOUBLE) / count(*), 6)
      AS avg_logp
  FROM scored GROUP BY doc_id
), bounds AS (
  SELECT quantile_cont(avg_logp, CAST(2 AS DOUBLE) / 3) AS b1,
         quantile_cont(avg_logp, CAST(1 AS DOUBLE) / 3) AS b2
  FROM agg
)
SELECT doc_id, n_bigrams, avg_logp,
  CAST(CASE WHEN avg_logp > b1 THEN 1
            WHEN avg_logp > b2 THEN 2
            ELSE 3 END AS INTEGER) AS tertile,
  CAST(CASE WHEN avg_logp > b2 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM agg, bounds
"""


ORACLES["layout_zorder_skipping"] = """
WITH e AS (
  SELECT event_id, CAST(user_id % 16 AS BIGINT) AS u,
    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
      AS day
  FROM events
), s1 AS (
  SELECT *,
    ((u | (u << 8)) & 16711935) AS su1,
    ((day | (day << 8)) & 16711935) AS sd1
  FROM e
), s2 AS (
  SELECT *, ((su1 | (su1 << 4)) & 252645135) AS su2,
            ((sd1 | (sd1 << 4)) & 252645135) AS sd2 FROM s1
), s3 AS (
  SELECT *, ((su2 | (su2 << 2)) & 858993459) AS su3,
            ((sd2 | (sd2 << 2)) & 858993459) AS sd3 FROM s2
), s4 AS (
  SELECT event_id, u, day,
    ((su3 | (su3 << 1)) & 1431655765) AS su,
    ((sd3 | (sd3 << 1)) & 1431655765) AS sd
  FROM s3
), laid AS (
  SELECT u, day,
    ntile(64) OVER (ORDER BY (su | (sd << 1)), event_id) AS f_zorder,
    ntile(64) OVER (ORDER BY event_id) AS f_linear,
    ntile(64) OVER (ORDER BY u, event_id) AS f_user
  FROM s4
), stacked AS (
  SELECT u, day, 'zorder' AS layout, f_zorder AS file_id FROM laid
  UNION ALL
  SELECT u, day, 'linear' AS layout, f_linear AS file_id FROM laid
  UNION ALL
  SELECT u, day, 'user' AS layout, f_user AS file_id FROM laid
), zones AS (
  SELECT layout, file_id, CAST(count(*) AS BIGINT) AS rows_,
    min(u) AS min_u, max(u) AS max_u, min(day) AS min_d, max(day) AS max_d,
    CAST(sum(CASE WHEN u BETWEEN 4 AND 7 AND day BETWEEN 7 AND 13
             THEN 1 ELSE 0 END) AS BIGINT) AS match_rows
  FROM stacked GROUP BY 1, 2
)
SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
  CAST(sum(CASE WHEN NOT (max_u < 4 OR min_u > 7 OR max_d < 7 OR min_d > 13)
           THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
  CAST(sum(CASE WHEN NOT (max_u < 4 OR min_u > 7 OR max_d < 7 OR min_d > 13)
           THEN rows_ ELSE 0 END) AS BIGINT) AS rows_read,
  CAST(sum(match_rows) AS BIGINT) AS rows_match
FROM zones GROUP BY layout
"""


ORACLES["retrieval_eval_metrics"] = _RAG_RANKED + r""", legs AS (
  SELECT query_id, doc_id, 'bm25' AS leg, lr AS rank FROM ranked WHERE lr <= 20
  UNION ALL
  SELECT query_id, doc_id, 'ql' AS leg, qr AS rank FROM ranked WHERE qr <= 20
), totals AS (
  SELECT qq.query_id,
    CAST(sum(CASE WHEN CAST(('0x' || substring(md5(
      'q' || CAST(qq.query_id AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)
    ), 1, 8)) AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
  FROM (SELECT DISTINCT query_id FROM q) qq CROSS JOIN documents d
  GROUP BY 1
), gain AS (
  SELECT CAST(r AS INTEGER) AS rank, round(1.0 / log2(r + 1.0), 6) AS g
  FROM range(1, 11) t(r)
), labeled AS (
  SELECT l.query_id, l.leg, l.rank, g.g,
    CASE WHEN CAST(('0x' || substring(md5(
      'q' || CAST(l.query_id AS VARCHAR) || ':' || CAST(l.doc_id AS VARCHAR)
    ), 1, 8)) AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END AS rel
  FROM legs l LEFT JOIN gain g ON l.rank = g.rank
), per_leg AS (
  SELECT query_id, leg,
    CAST(sum(CASE WHEN rel = 1 AND rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
      AS hits_top10,
    min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
    CAST(sum(CAST(CASE WHEN rel = 1 AND rank <= 10 THEN g ELSE 0.0 END
      AS DECIMAL(27,6))) AS DOUBLE) AS dcg
  FROM labeled GROUP BY 1, 2
), idcg AS (
  SELECT t.query_id, t.n_relevant,
    CAST(sum(CAST(g.g AS DECIMAL(27,6))) AS DOUBLE) AS idcg
  FROM totals t JOIN gain g ON g.rank <= least(10, t.n_relevant)
  GROUP BY 1, 2
)
SELECT p.query_id, p.leg, i.n_relevant, p.hits_top10,
  round(CAST(p.hits_top10 AS DOUBLE) / i.n_relevant, 6) AS recall_at_10,
  round(coalesce(1.0 / p.first_rel, 0.0), 6) AS mrr_at_20,
  round(p.dcg / i.idcg, 6) AS ndcg_at_10
FROM per_leg p JOIN idcg i USING (query_id)
"""


ORACLES["gdpr_delete_roundtrip"] = """
WITH g AS (
  SELECT user_id, event_id % 2 AS ep, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT 'before' AS stage, 'raw' AS leaf, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(event_id) AS BIGINT) AS key_sum FROM events
UNION ALL
SELECT 'before', 'agg', CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT) FROM g
UNION ALL
SELECT 'after_delete', 'raw', CAST(count(*) AS BIGINT),
  CAST(sum(event_id) AS BIGINT) FROM events WHERE user_id % 7 <> 3
UNION ALL
SELECT 'after_delete', 'agg', CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT)
FROM g WHERE user_id % 7 <> 3
UNION ALL
SELECT 'asof0_after', 'raw', CAST(count(*) AS BIGINT),
  CAST(sum(event_id) AS BIGINT) FROM events
WHERE user_id % 7 <> 3 AND event_id % 2 = 0
UNION ALL
SELECT 'asof0_after', 'agg', CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT)
FROM g WHERE user_id % 7 <> 3 AND ep = 0
"""


ORACLES["cdc_upsert_roundtrip"] = """
WITH d AS (
  SELECT user_id,
    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
      AS day
  FROM events
), base AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM d WHERE day < 20
  GROUP BY 1
), late AS (
  SELECT DISTINCT user_id FROM d WHERE day >= 20
), full_tot AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
), latest AS (
  SELECT f.user_id, f.n FROM full_tot f JOIN late l USING (user_id)
  WHERE f.user_id % 10 <> 4
  UNION ALL
  SELECT b.user_id, b.n FROM base b
  WHERE b.user_id NOT IN (SELECT user_id FROM late)
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users, CAST(sum(n) AS BIGINT) AS sum_n,
    CAST(sum(user_id) AS BIGINT) AS sum_uid
  FROM latest
)
SELECT 'merged' AS stage, n_users, sum_n, sum_uid FROM agg
UNION ALL
SELECT 'compacted', n_users, sum_n, sum_uid FROM agg
"""


ORACLES["streaming_cdc_upsert"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), b AS (
  SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM e
), s AS (
  SELECT user_id, event_id,
    least((ts_us - mn) * 3 // (mx - mn + 1), 2) AS sl
  FROM e CROSS JOIN b
), per AS (
  SELECT user_id, sl, CAST(count(*) AS BIGINT) AS n,
    CAST(max(event_id) AS BIGINT) AS last_event
  FROM s GROUP BY 1, 2
), latest AS (
  SELECT user_id, n, last_event, sl,
    row_number() OVER (PARTITION BY user_id ORDER BY sl DESC) AS rn
  FROM per
)
SELECT user_id, n, last_event, CAST(sl AS INTEGER) AS last_slice
FROM latest WHERE rn = 1 AND NOT (user_id % 10 = 4 AND sl = 2)
"""


ORACLES["dp_noisy_group_counts"] = """
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_user_days
  FROM (
    SELECT DISTINCT event_type, user_id,
      CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
        AS day
    FROM events
  ) GROUP BY 1
), m AS (
  SELECT event_type, n_user_days,
    (CAST(('0x' || substring(md5('dp-r9:' || event_type), 1, 5)) AS BIGINT)
      + 0.5) / 1048576.0 AS u
  FROM c
)
SELECT event_type, n_user_days,
  round(-(1.0 / 0.5) * sign(u - 0.5)
    * round(ln(1.0 - 2.0 * abs(u - 0.5)), 6), 6) AS laplace_noise,
  round(n_user_days
    + round(-(1.0 / 0.5) * sign(u - 0.5)
        * round(ln(1.0 - 2.0 * abs(u - 0.5)), 6), 6), 6) AS released_count,
  CAST(0.5 AS DOUBLE) AS epsilon_spent, 1 AS sensitivity
FROM m
"""


ORACLES["bootstrap_poisson_ci"] = """
WITH reps AS (
  SELECT d.source, d.n_chars, d.doc_id, b.b
  FROM documents d CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b
), wtd AS (
  SELECT source, n_chars, b,
    (CAST(('0x' || substring(md5(
       CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 5))
      AS BIGINT) + 0.5) / 1048576.0 AS u
  FROM reps
), ww AS (
  SELECT source, n_chars, b,
    CASE WHEN u < 0.3678794412 THEN 0
         WHEN u < 0.7357588823 THEN 1
         WHEN u < 0.9196986029 THEN 2
         WHEN u < 0.9810118431 THEN 3
         WHEN u < 0.9963401532 THEN 4
         WHEN u < 0.9994058152 THEN 5
         WHEN u < 0.9999167589 THEN 6
         ELSE 7 END AS w
  FROM wtd
), means AS (
  SELECT source, b,
    round(CAST(sum(w * n_chars) AS DOUBLE) / sum(w), 6) AS m
  FROM ww GROUP BY 1, 2
), ranked AS (
  SELECT source, m, row_number() OVER (PARTITION BY source ORDER BY m, b) AS rn
  FROM means
), point AS (
  SELECT source,
    round(CAST(CAST(sum(n_chars) AS DECIMAL(27,6)) AS DOUBLE) / count(*), 6)
      AS point_mean
  FROM documents GROUP BY 1
), ci AS (
  SELECT source, max(CASE WHEN rn = 2 THEN m END) AS ci_lo,
    max(CASE WHEN rn = 31 THEN m END) AS ci_hi
  FROM ranked GROUP BY 1
)
SELECT p.source, p.point_mean, c.ci_lo, c.ci_hi, 32 AS b_reps
FROM point p JOIN ci c USING (source)
"""


ORACLES["retrieval_hard_negatives"] = _RAG_RANKED + r""", lab AS (
  SELECT query_id, doc_id, lr,
    CASE WHEN CAST(('0x' || substring(md5(
      'q' || CAST(query_id AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)
    ), 1, 8)) AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE lr <= 20
), pos AS (
  SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_positives_top20
  FROM lab GROUP BY 1
), negs AS (
  SELECT query_id, doc_id, lr,
    row_number() OVER (PARTITION BY query_id ORDER BY lr) AS neg_rank
  FROM lab WHERE rel = 0
)
SELECT n.query_id, CAST(n.neg_rank AS INTEGER) AS neg_rank, n.doc_id,
  CAST(n.lr AS INTEGER) AS bm25_rank, p.n_positives_top20
FROM negs n JOIN pos p USING (query_id)
WHERE n.neg_rank <= 5
"""


ORACLES["psi_drift_monitor"] = """
WITH e AS (
  SELECT event_type,
    CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) < 15
         THEN 'ref' ELSE 'cur' END AS period,
    CAST(least(floor(value / 25.0), 9) AS INTEGER) AS bin
  FROM events
), counts AS (
  SELECT event_type, period, bin, CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2, 3
), lattice AS (
  SELECT t.event_type, CAST(b.b AS INTEGER) AS bin
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (SELECT unnest(range(0, 10)) AS b) b
), dense AS (
  SELECT l.event_type, l.bin,
    coalesce(r.n, 0) AS n_ref, coalesce(c.n, 0) AS n_cur
  FROM lattice l
  LEFT JOIN counts r ON r.event_type = l.event_type AND r.bin = l.bin
    AND r.period = 'ref'
  LEFT JOIN counts c ON c.event_type = l.event_type AND c.bin = l.bin
    AND c.period = 'cur'
), tot AS (
  SELECT event_type, CAST(sum(n_ref) AS BIGINT) AS t_ref,
    CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM dense GROUP BY 1
), c AS (
  SELECT d.event_type, t.t_ref, t.t_cur,
    round(((d.n_ref + 0.5) / (t.t_ref + 5.0) - (d.n_cur + 0.5) / (t.t_cur + 5.0))
      * ln(((d.n_ref + 0.5) / (t.t_ref + 5.0))
           / ((d.n_cur + 0.5) / (t.t_cur + 5.0))), 6) AS contrib
  FROM dense d JOIN tot t USING (event_type)
), agg AS (
  SELECT event_type, max(t_ref) AS n_ref_rows, max(t_cur) AS n_cur_rows,
    round(CAST(sum(CAST(contrib AS DECIMAL(27,6))) AS DOUBLE), 6) AS psi
  FROM c GROUP BY 1
)
SELECT event_type, n_ref_rows, n_cur_rows, psi,
  CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate'
       ELSE 'shifted' END AS drift_band
FROM agg
"""


ORACLES["pit_feature_join"] = """
WITH v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), j AS (
  SELECT v.event_id, v.user_id,
    (SELECT r.value FROM events r
     WHERE r.event_type = 'purchase' AND r.user_id = v.user_id
       AND r.ts <= v.ts
     ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS naive_value,
    (SELECT r.value FROM events r
     WHERE r.event_type = 'purchase' AND r.user_id = v.user_id
       AND r.ts + INTERVAL 1 HOUR <= v.ts
     ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS pit_value
  FROM v
)
SELECT event_id, user_id, naive_value, pit_value,
  CAST(naive_value IS DISTINCT FROM pit_value AS INTEGER) AS leaked
FROM j
"""


ORACLES["l_diversity_audit"] = (
    # the k-anonymity release as a CTE, audited for sensitive-value
    # diversity on top (sensitive = latest order priority, 'NONE' for
    # customers without orders)
    "WITH release AS (" + ORACLES["k_anonymity_generalize"].strip() + ")"
    + """
, sens AS (
  SELECT c.c_custkey, coalesce(l.pri, 'NONE') AS cc
  FROM customer c LEFT JOIN (
    SELECT o_custkey, o_orderpriority AS pri FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
  ) l ON c.c_custkey = l.o_custkey
)
SELECT r.level, r.qi_geo, r.qi_seg, r.qi_band,
  CAST(count(*) AS BIGINT) AS group_size,
  CAST(count(DISTINCT s.cc) AS BIGINT) AS distinct_sensitive,
  CAST(CASE WHEN count(DISTINCT s.cc) >= 3 THEN 1 ELSE 0 END AS INTEGER)
    AS l_diverse
FROM release r JOIN sens s ON r.c_custkey = s.c_custkey
WHERE r.level < 3
GROUP BY 1, 2, 3, 4
"""
)


# Incremental semantic near-dedup against the persisted anchor-cell
# vector index.  Cosines fold the 64 dims in index order (list_sum over
# list_transform) exactly as the Spark side's F.aggregate left fold, so
# cell argmax, hit counts, and best similarities are bit-identical; the
# "all"-scope epoch appends reduce to p.slice < n.slice (no recursion).
_ANN_COS = (
    "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
    " / ( sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i] * {a}[i])))"
    "   * sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i] * {b}[i]))))"
)

ORACLES["ann_incremental_semantic_dedup"] = f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
),
b AS (
  SELECT vec_id, CAST(vec_id % 3 AS INTEGER) AS slice,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM base
),
anch AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM b WHERE slice = 0 ORDER BY vec_id LIMIT 16)
),
cells AS (
  SELECT vec_id, slice, v, aid AS cell FROM (
    SELECT b.vec_id, b.slice, b.v, anch.aid,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY {_ANN_COS.format(a="b.v", b="anch.av")} DESC, anch.aid ASC
      ) AS rn
    FROM b CROSS JOIN anch
  ) WHERE rn = 1
),
pairs AS (
  SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
  FROM cells n JOIN cells p ON p.cell = n.cell AND p.slice < n.slice
),
hits AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM pairs WHERE ps >= 0.9 GROUP BY vec_id
)
SELECT c.vec_id, c.slice, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits,
       h.best_sim
FROM cells c LEFT JOIN hits h USING (vec_id)
"""


def _ann_kmeans_iter(prev: str, out: str) -> str:
    """One decimal-exact spherical k-means iteration as SQL CTEs,
    mirroring ``similarity.kmeans_anchors_decimal`` step for step:
    assignment is the ordered-fold cosine argmax (ties -> smaller aid,
    like every anchor-cell oracle), the update quantizes components to
    1e-6 BIGINTs (exact order-free sums) and takes the half-up rounded
    integer mean in one deterministic double division, and an empty
    cell keeps its previous centroid via the LEFT JOIN + COALESCE."""
    return f"""
asg_{out} AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT s0.vec_id, s0.v, {prev}.aid,
      row_number() OVER (PARTITION BY s0.vec_id
        ORDER BY {_ANN_COS.format(a="s0.v", b=f"{prev}.av")} DESC,
                 {prev}.aid ASC) AS rn
    FROM s0 CROSS JOIN {prev}
  ) WHERE rn = 1
),
upd_{out} AS (
  SELECT cell AS aid, pos,
    CAST(floor((2*CAST(sum(q) AS DOUBLE) + CAST(count(*) AS DOUBLE))
         / (2*CAST(count(*) AS DOUBLE))) AS BIGINT) AS nq
  FROM (
    SELECT cell, i AS pos, CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT) AS q
    FROM asg_{out}, range(1, 65) t(i)
  ) GROUP BY cell, pos
),
updl_{out} AS (
  SELECT aid, list(CAST(nq AS DOUBLE) / 1000000.0 ORDER BY pos) AS av
  FROM upd_{out} GROUP BY aid
),
{out} AS (
  SELECT p.aid, COALESCE(u.av, p.av) AS av
  FROM {prev} p LEFT JOIN updl_{out} u USING (aid)
)"""


# Trained-codebook vector index: the oracle re-derives the 2-iteration
# decimal k-means anchors bit-identically (see _ann_kmeans_iter), then
# replays the same 3-slice incremental screen as the untrained sibling.
# compact_after=1 on the Spark side is invisible here by design —
# compaction preserves the cell-row set, which is exactly the invariant
# this gate now enforces every round (VERDICT r11 #3).
ORACLES["ann_kmeans_semantic_dedup"] = f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
),
b AS (
  SELECT vec_id, CAST(vec_id % 3 AS INTEGER) AS slice,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM base
),
s0 AS (SELECT vec_id, v FROM b WHERE slice = 0),
a0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s0 ORDER BY vec_id LIMIT 16)
),{_ann_kmeans_iter("a0", "a1")},{_ann_kmeans_iter("a1", "a2")},
cells AS (
  SELECT vec_id, slice, v, aid AS cell FROM (
    SELECT b.vec_id, b.slice, b.v, a2.aid,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY {_ANN_COS.format(a="b.v", b="a2.av")} DESC, a2.aid ASC
      ) AS rn
    FROM b CROSS JOIN a2
  ) WHERE rn = 1
),
pairs AS (
  SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
  FROM cells n JOIN cells p ON p.cell = n.cell AND p.slice < n.slice
),
hits AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM pairs WHERE ps >= 0.9 GROUP BY vec_id
)
SELECT c.vec_id, c.slice, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits,
       h.best_sim
FROM cells c LEFT JOIN hits h USING (vec_id)
"""


# Survivor-anchored ANN appends: the oracle unrolls the survivor
# recursion exactly one level — slice 1 screens against slice 0 (the
# whole bootstrapped index), slice 2 screens against slice 0 plus the
# slice-1 rows that had NO hit (the only rows the survivors policy
# appended).  The drift arithmetic (x + t*y per dim) is two IEEE double
# ops reproduced verbatim, so the full ledger is value-hash-exact.
ORACLES["ann_incremental_survivors"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
anch AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
),
xy AS (
  SELECT x.vec_id, x.v AS xv, y.v AS yv
  FROM e x JOIN e y ON y.vec_id = x.vec_id + 1
  WHERE x.vec_id % 7 = 0
),
s1 AS (
  SELECT vec_id + 200000 AS vec_id,
         list_transform(range(1, 65),
                        i -> xv[i] + CAST(0.25 AS DOUBLE) * yv[i]) AS v
  FROM xy
),
s2 AS (
  SELECT vec_id + 300000 AS vec_id,
         list_transform(range(1, 65),
                        i -> xv[i] + CAST(0.55 AS DOUBLE) * yv[i]) AS v
  FROM xy
),
cell0 AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT e.vec_id, e.v, anch.aid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ANN_COS.format(a="e.v", b="anch.av")} DESC, anch.aid ASC) AS rn
    FROM e CROSS JOIN anch
  ) WHERE rn = 1
),
cell1 AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT s1.vec_id, s1.v, anch.aid,
      row_number() OVER (PARTITION BY s1.vec_id
        ORDER BY {_ANN_COS.format(a="s1.v", b="anch.av")} DESC, anch.aid ASC) AS rn
    FROM s1 CROSS JOIN anch
  ) WHERE rn = 1
),
cell2 AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT s2.vec_id, s2.v, anch.aid,
      row_number() OVER (PARTITION BY s2.vec_id
        ORDER BY {_ANN_COS.format(a="s2.v", b="anch.av")} DESC, anch.aid ASC) AS rn
    FROM s2 CROSS JOIN anch
  ) WHERE rn = 1
),
hits1 AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
    FROM cell1 n JOIN cell0 p ON p.cell = n.cell
  ) WHERE ps >= 0.9 GROUP BY vec_id
),
idx2 AS (
  SELECT vec_id, v, cell FROM cell0
  UNION ALL
  SELECT c.vec_id, c.v, c.cell FROM cell1 c
  LEFT JOIN hits1 h ON c.vec_id = h.vec_id WHERE h.vec_id IS NULL
),
hits2 AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
    FROM cell2 n JOIN idx2 p ON p.cell = n.cell
  ) WHERE ps >= 0.9 GROUP BY vec_id
)
SELECT c.vec_id, CAST(1 AS INTEGER) AS slice, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM cell1 c LEFT JOIN hits1 h USING (vec_id)
UNION ALL
SELECT c.vec_id, CAST(2 AS INTEGER) AS slice, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM cell2 c LEFT JOIN hits2 h USING (vec_id)
"""


# nprobe multi-cell screen: arriving cells are taken at row_number <= P
# (cos DESC, aid ASC — the same ranking Spark's (-score, aid) struct
# sort produces bit-exactly); stored vectors stay single-cell, so no
# pair double-counts.  Both ledgers (P=1, P=2) under one gate.
ORACLES["ann_nprobe_boundary_recall"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
anch AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
),
mid AS (
  SELECT x.vec_id + 400000 AS vec_id,
         list_transform(range(1, 65), i -> x.v[i] + y.v[i]) AS v
  FROM e x JOIN e y ON y.vec_id = x.vec_id + 1
  WHERE x.vec_id % 5 = 0
),
cell0 AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT e.vec_id, e.v, anch.aid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ANN_COS.format(a="e.v", b="anch.av")} DESC, anch.aid ASC) AS rn
    FROM e CROSS JOIN anch
  ) WHERE rn = 1
),
cellm AS (
  SELECT vec_id, v, aid AS cell, rn FROM (
    SELECT mid.vec_id, mid.v, anch.aid,
      row_number() OVER (PARTITION BY mid.vec_id
        ORDER BY {_ANN_COS.format(a="mid.v", b="anch.av")} DESC, anch.aid ASC) AS rn
    FROM mid CROSS JOIN anch
  ) WHERE rn <= 2
),
hits AS (
  SELECT np, vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT p_.np, n.vec_id, {_ANN_COS.format(a="n.v", b="s.v")} AS ps
    FROM (VALUES (1), (2)) p_(np)
    JOIN cellm n ON n.rn <= p_.np
    JOIN cell0 s ON s.cell = n.cell
  ) WHERE ps >= 0.7 GROUP BY np, vec_id
)
SELECT c.vec_id, CAST(p_.np AS INTEGER) AS nprobe, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM (VALUES (1), (2)) p_(np)
CROSS JOIN (SELECT vec_id, cell FROM cellm WHERE rn = 1) c
LEFT JOIN hits h ON h.np = p_.np AND h.vec_id = c.vec_id
"""


# The streaming ANN-index twin replays the exact corpus/slice/screen
# semantics of the batch query (trigger k == slice k; the index is the
# strictly-earlier slices; compaction is decision-invariant), so the
# two share one oracle.
ORACLES["streaming_ann_incremental_dedup"] = ORACLES[
    "ann_incremental_semantic_dedup"
]


# Rebuild arm of the anchor lifecycle (r13): phase 1 replays the
# pre-rebuild screen (slice 1 vs the 16-anchor bootstrap, all-scope
# append semantics = p.slice < n.slice over slices {0,1}); the rebuild
# trains an 8-cell decimal k-means codebook on the STORED vectors
# (slices 0+1 — s0 is the training set _ann_kmeans_iter references),
# re-derived bit-identically; phase 2 is every stored vector's cell
# under that codebook (the rebuilt index's cells leaf); phase 3
# screens slice 2 against the rebuilt index.
ORACLES["ann_rebuild_semantic_dedup"] = f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
),
b AS (
  SELECT vec_id, CAST(vec_id % 3 AS INTEGER) AS slice,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM base
),
a_old AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM b WHERE slice = 0 ORDER BY vec_id LIMIT 16)
),
cells_old AS (
  SELECT vec_id, slice, v, aid AS cell FROM (
    SELECT b.vec_id, b.slice, b.v, a_old.aid,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY {_ANN_COS.format(a="b.v", b="a_old.av")} DESC, a_old.aid ASC
      ) AS rn
    FROM b CROSS JOIN a_old WHERE b.slice < 2
  ) WHERE rn = 1
),
hits1 AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
    FROM cells_old n JOIN cells_old p
      ON p.cell = n.cell AND p.slice = 0 AND n.slice = 1
  ) WHERE ps >= 0.9 GROUP BY vec_id
),
s0 AS (SELECT vec_id, v FROM b WHERE slice < 2),
a0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s0 ORDER BY vec_id LIMIT 8)
),{_ann_kmeans_iter("a0", "a1")},{_ann_kmeans_iter("a1", "a2")},
cells_new AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT s0.vec_id, s0.v, a2.aid,
      row_number() OVER (
        PARTITION BY s0.vec_id
        ORDER BY {_ANN_COS.format(a="s0.v", b="a2.av")} DESC, a2.aid ASC
      ) AS rn
    FROM s0 CROSS JOIN a2
  ) WHERE rn = 1
),
cells2 AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT b.vec_id, b.v, a2.aid,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY {_ANN_COS.format(a="b.v", b="a2.av")} DESC, a2.aid ASC
      ) AS rn
    FROM b CROSS JOIN a2 WHERE b.slice = 2
  ) WHERE rn = 1
),
hits3 AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
    FROM cells2 n JOIN cells_new p ON p.cell = n.cell
  ) WHERE ps >= 0.9 GROUP BY vec_id
)
SELECT c.vec_id, CAST(1 AS INTEGER) AS phase, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM (SELECT * FROM cells_old WHERE slice = 1) c LEFT JOIN hits1 h USING (vec_id)
UNION ALL
SELECT vec_id, CAST(2 AS INTEGER) AS phase, cell,
       TRUE AS is_new, CAST(0 AS INTEGER) AS n_prior_hits,
       CAST(NULL AS DOUBLE) AS best_sim
FROM cells_new
UNION ALL
SELECT c.vec_id, CAST(3 AS INTEGER) AS phase, c.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM cells2 c LEFT JOIN hits3 h USING (vec_id)
"""


# Streaming multi-probe twin (r13): trigger k == slice k; the index at
# trigger k is every earlier slice (all-scope appends); the ARRIVING
# vector probes its top-2 cells (rn <= 2, cos DESC aid ASC — the same
# bit-exact ranking as Spark's (-score, aid) struct sort), stored
# vectors stay in their primary cell, and the ledger cell is the
# primary.  Compaction between triggers is decision-invariant.
ORACLES["streaming_ann_nprobe_dedup"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
mid AS (
  SELECT x.vec_id + 400000 AS vec_id,
         list_transform(range(1, 65), i -> x.v[i] + y.v[i]) AS v
  FROM e x JOIN e y ON y.vec_id = x.vec_id + 1
  WHERE x.vec_id % 5 = 0
),
b AS (
  SELECT vec_id, CAST(vec_id % 3 AS INTEGER) AS slice, v FROM e
  UNION ALL
  SELECT vec_id, CAST(vec_id % 3 AS INTEGER) AS slice, v FROM mid
),
anch AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM b WHERE slice = 0 ORDER BY vec_id LIMIT 16)
),
ranked AS (
  SELECT vec_id, slice, v, aid AS cell, rn FROM (
    SELECT b.vec_id, b.slice, b.v, anch.aid,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY {_ANN_COS.format(a="b.v", b="anch.av")} DESC, anch.aid ASC
      ) AS rn
    FROM b CROSS JOIN anch
  ) WHERE rn <= 2
),
hits AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT n.vec_id, {_ANN_COS.format(a="n.v", b="p.v")} AS ps
    FROM ranked n
    JOIN ranked p ON p.rn = 1 AND p.cell = n.cell AND p.slice < n.slice
  ) WHERE ps >= 0.7 GROUP BY vec_id
)
SELECT c.vec_id, c.slice, c.cell,
       CASE WHEN c.slice = 0 THEN TRUE ELSE (h.vec_id IS NULL) END AS is_new,
       CASE WHEN c.slice = 0 THEN 0 ELSE COALESCE(h.n_prior_hits, 0) END
         AS n_prior_hits,
       CASE WHEN c.slice = 0 THEN NULL ELSE h.best_sim END AS best_sim
FROM (SELECT vec_id, slice, cell FROM ranked WHERE rn = 1) c
LEFT JOIN hits h USING (vec_id)
"""


# Round 13: the vectorized (broadcast-matmul) kernel under the gate —
# the oracle re-derives the EXPRESSION kernel's assignment (the
# ordered-fold cosine argmax, ties toward the smaller anchor id) and
# pins n_mismatch = 0, so any argmax divergence between the BLAS and
# fold kernels on real data fails the value hash.
ORACLES["ann_kernel_parity"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
a AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 12)
),
cells AS (
  SELECT vec_id, aid AS cell FROM (
    SELECT e.vec_id, a.aid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ANN_COS.format(a="e.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM e CROSS JOIN a
  ) WHERE rn = 1
)
SELECT cell, count(*) AS n_vec, CAST(0 AS BIGINT) AS n_mismatch
FROM cells GROUP BY cell
"""


# Round 13: cluster-balanced prototype sampling — re-derives the
# 8-anchor 2-iteration decimal k-means codebook (same CTE technique as
# ann_kmeans_semantic_dedup, trained on the FULL corpus here), assigns
# every vector, and keeps the 5 most-central per cell.  Ranking uses
# the unrounded fold cosine; only the output rounds.
ORACLES["cluster_balanced_sample"] = f"""
WITH s0 AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
a0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s0 ORDER BY vec_id LIMIT 8)
),{_ann_kmeans_iter("a0", "a1")},{_ann_kmeans_iter("a1", "a2")},
cells AS (
  SELECT vec_id, cell, cs FROM (
    SELECT s0.vec_id, a2.aid AS cell,
      {_ANN_COS.format(a="s0.v", b="a2.av")} AS cs,
      row_number() OVER (PARTITION BY s0.vec_id
        ORDER BY {_ANN_COS.format(a="s0.v", b="a2.av")} DESC, a2.aid ASC) AS rn
    FROM s0 CROSS JOIN a2
  ) WHERE rn = 1
),
ranked AS (
  SELECT vec_id, cell, cs,
    row_number() OVER (PARTITION BY cell ORDER BY cs DESC, vec_id ASC) AS rnk
  FROM cells
)
SELECT vec_id, cell, CAST(rnk AS INTEGER) AS rnk, round(cs, 6) AS cos_centroid
FROM ranked WHERE rnk <= 5
"""


# Round 13: hard-negative mining — within the trained cell, the top
# cross-label neighbor per query (cosine DESC, neg_id ASC).  The pair
# cosine's division tree d / (sqrt * sqrt) matches the Spark side's
# hoisted-norm d / (nq * nn) bit-exactly (same three doubles).
ORACLES["hard_negative_mining"] = f"""
WITH s0 AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
a0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s0 ORDER BY vec_id LIMIT 8)
),{_ann_kmeans_iter("a0", "a1")},{_ann_kmeans_iter("a1", "a2")},
cells AS (
  SELECT vec_id, aid AS cell FROM (
    SELECT s0.vec_id, a2.aid,
      row_number() OVER (PARTITION BY s0.vec_id
        ORDER BY {_ANN_COS.format(a="s0.v", b="a2.av")} DESC, a2.aid ASC) AS rn
    FROM s0 CROSS JOIN a2
  ) WHERE rn = 1
),
c AS (
  SELECT s0.vec_id, s0.label, s0.v, cells.cell
  FROM s0 JOIN cells USING (vec_id)
),
pairs AS (
  SELECT q.vec_id, q.label, q.cell,
         n.vec_id AS neg_id, n.label AS neg_label,
         {_ANN_COS.format(a="q.v", b="n.v")} AS cs
  FROM c q JOIN c n ON n.cell = q.cell AND n.label <> q.label
)
SELECT vec_id, label, cell, neg_id, neg_label, round(cs, 6) AS neg_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cs DESC, neg_id ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""


# Round 13: index-backed hard-negative mining, two phases — phase 1
# mines slice 1 against the bootstrapped slice-0 index, slice 1 is
# appended (with its label payload), phase 2 mines slice 2 against
# slices 0+1.  Anchors are the 8 smallest-id STORED (slice 0) vectors
# (the bootstrap rule); every cosine is the ordered fold.
ORACLES["index_hard_negative_mining"] = f"""
WITH e AS (
  SELECT vec_id, label, CAST(vec_id % 3 AS INTEGER) AS slice,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
s0 AS (SELECT vec_id, v FROM e WHERE slice = 0),
a AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s0 ORDER BY vec_id LIMIT 8)
),
cells AS (
  SELECT vec_id, aid AS cell FROM (
    SELECT e.vec_id, a.aid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ANN_COS.format(a="e.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM e CROSS JOIN a
  ) WHERE rn = 1
),
c AS (
  SELECT e.vec_id, e.label, e.slice, e.v, cells.cell
  FROM e JOIN cells USING (vec_id)
),
pairs AS (
  SELECT q.vec_id, CAST(1 AS INTEGER) AS phase, q.label, q.cell,
         n.vec_id AS neg_id, n.label AS neg_label,
         {_ANN_COS.format(a="q.v", b="n.v")} AS cs
  FROM c q JOIN c n
    ON n.cell = q.cell AND n.label <> q.label AND n.slice = 0
  WHERE q.slice = 1
  UNION ALL
  SELECT q.vec_id, CAST(2 AS INTEGER) AS phase, q.label, q.cell,
         n.vec_id AS neg_id, n.label AS neg_label,
         {_ANN_COS.format(a="q.v", b="n.v")} AS cs
  FROM c q JOIN c n
    ON n.cell = q.cell AND n.label <> q.label AND n.slice IN (0, 1)
  WHERE q.slice = 2
)
SELECT vec_id, phase, label, cell, neg_id, neg_label, round(cs, 6) AS neg_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id, phase ORDER BY cs DESC, neg_id ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""


# Round 13: top-k retrieval against the persisted index.  Anchors are
# the 8 smallest-id STORED vectors (bootstrap rule); queries probe
# their top-2 anchor cells (cos DESC, aid ASC — Spark's (-score, aid)
# struct sort, bit-exactly); stored vectors are single-cell; global
# rank = (cosine DESC, match_id ASC), k=3.
ORACLES["index_topk_search"] = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
s AS (SELECT * FROM e WHERE vec_id % 3 <> 0),
q AS (SELECT * FROM e WHERE vec_id % 3 = 0),
a AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s ORDER BY vec_id LIMIT 8)
),
scell AS (
  SELECT vec_id, label, v, aid AS cell FROM (
    SELECT s.vec_id, s.label, s.v, a.aid,
      row_number() OVER (PARTITION BY s.vec_id
        ORDER BY {_ANN_COS.format(a="s.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM s CROSS JOIN a
  ) WHERE rn = 1
),
qcell AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT q.vec_id, q.v, a.aid,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY {_ANN_COS.format(a="q.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM q CROSS JOIN a
  ) WHERE rn <= 2
),
pairs AS (
  SELECT qc.vec_id, n.label AS match_label, n.vec_id AS match_id,
         {_ANN_COS.format(a="qc.v", b="n.v")} AS cs
  FROM qcell qc JOIN scell n ON n.cell = qc.cell
)
SELECT vec_id, CAST(rn AS INTEGER) AS rank, match_id, match_label,
       round(cs, 6) AS match_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cs DESC, match_id ASC) AS rn
  FROM pairs
) WHERE rn <= 3
"""


# Filtered variant: the label predicate restricts CANDIDATES (not the
# index build — anchors/cells are over all stored rows), so each query
# still gets up to k true label-1 matches; single-cell probe.
ORACLES["index_filtered_topk"] = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
s AS (SELECT * FROM e WHERE vec_id % 3 <> 0),
q AS (SELECT * FROM e WHERE vec_id % 3 = 0),
a AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM s ORDER BY vec_id LIMIT 8)
),
scell AS (
  SELECT vec_id, label, v, aid AS cell FROM (
    SELECT s.vec_id, s.label, s.v, a.aid,
      row_number() OVER (PARTITION BY s.vec_id
        ORDER BY {_ANN_COS.format(a="s.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM s CROSS JOIN a
  ) WHERE rn = 1
),
qcell AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT q.vec_id, q.v, a.aid,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY {_ANN_COS.format(a="q.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM q CROSS JOIN a
  ) WHERE rn = 1
),
pairs AS (
  SELECT qc.vec_id, n.label AS match_label, n.vec_id AS match_id,
         {_ANN_COS.format(a="qc.v", b="n.v")} AS cs
  FROM qcell qc JOIN scell n ON n.cell = qc.cell AND n.label = 1
)
SELECT vec_id, CAST(rn AS INTEGER) AS rank, match_id, match_label,
       round(cs, 6) AS match_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cs DESC, match_id ASC) AS rn
  FROM pairs
) WHERE rn <= 3
"""


# The streaming serving twin replays the exact stored/query split of
# the batch query against the SAME static index — retrieval never
# mutates the index, and the drained union over disjoint query slices
# is the batch result row-for-row, so the two share one oracle.
ORACLES["streaming_index_topk"] = ORACLES["index_topk_search"]


# Round 13: per-cell inverted-list histogram of the persisted index
# (bootstrap = slices 0+1, appended epoch = slice 2; anchors are the 8
# smallest-id BOOTSTRAP vectors, every vector single-cell).
ORACLES["ann_index_stats"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
b AS (SELECT * FROM e WHERE vec_id % 3 <> 2),
a AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT 8)
),
cells AS (
  SELECT vec_id, aid AS cell FROM (
    SELECT e.vec_id, a.aid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ANN_COS.format(a="e.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM e CROSS JOIN a
  ) WHERE rn = 1
)
SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_id,
       max(vec_id) AS max_id
FROM cells GROUP BY cell
"""


# Round 13: the delete lifecycle.  One probe batch (every vec_id%7==0
# vector re-arrived at id+500000) screened three times at the
# self-match threshold 0.9999: phase 0 against the full stored set,
# phases 1 (tombstoned) and 2 (purged) against the survivors — the
# purge is decision-invariant by construction, so phases 1 and 2 share
# one hit set.  Anchors = 8 smallest-id vectors of the bootstrap
# slices (vec_id % 3 <> 2); the appended slice obeys the same rule.
ORACLES["ann_index_delete"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
b AS (SELECT * FROM e WHERE vec_id % 3 <> 2),
a AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS aid, v AS av
  FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT 8)
),
scell AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT e.vec_id, e.v, a.aid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ANN_COS.format(a="e.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM e CROSS JOIN a
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id + 500000 AS vec_id, v FROM e WHERE vec_id % 7 = 0
),
pc AS (
  SELECT vec_id, v, aid AS cell FROM (
    SELECT p.vec_id, p.v, a.aid,
      row_number() OVER (PARTITION BY p.vec_id
        ORDER BY {_ANN_COS.format(a="p.v", b="a.av")} DESC, a.aid ASC) AS rn
    FROM probe p CROSS JOIN a
  ) WHERE rn = 1
),
hits0 AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT p.vec_id, {_ANN_COS.format(a="p.v", b="s.v")} AS ps
    FROM pc p JOIN scell s ON s.cell = p.cell
  ) WHERE ps >= 0.9999 GROUP BY vec_id
),
hits1 AS (
  SELECT vec_id, CAST(count(*) AS INTEGER) AS n_prior_hits,
         round(max(ps), 6) AS best_sim
  FROM (
    SELECT p.vec_id, {_ANN_COS.format(a="p.v", b="s.v")} AS ps
    FROM pc p JOIN scell s ON s.cell = p.cell AND s.vec_id % 7 <> 0
  ) WHERE ps >= 0.9999 GROUP BY vec_id
)
SELECT p.vec_id, CAST(0 AS INTEGER) AS phase, p.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM pc p LEFT JOIN hits0 h USING (vec_id)
UNION ALL
SELECT p.vec_id, CAST(1 AS INTEGER) AS phase, p.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM pc p LEFT JOIN hits1 h USING (vec_id)
UNION ALL
SELECT p.vec_id, CAST(2 AS INTEGER) AS phase, p.cell,
       (h.vec_id IS NULL) AS is_new,
       COALESCE(h.n_prior_hits, 0) AS n_prior_hits, h.best_sim
FROM pc p LEFT JOIN hits1 h USING (vec_id)
"""
