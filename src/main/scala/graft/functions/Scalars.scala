package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** SURVEY.md §2.H — scalar function surface, the reference's
  * most-exercised layer: filename assembly (backup.sh:26–34), prefix
  * matching (backup.sh:119–122), CSV splitting (env.sh:24), the four
  * date-bucket templates (backup.sh:26–29), retention arithmetic
  * (env.sh:26–29), plus the [NS] JSON/array surface the fixture tables
  * exercise.
  *
  * Everything here is built-in `functions._` — whole-stage-codegen'd
  * narrow maps, no shuffle except where a groupBy is explicitly part of
  * the query shape. Type hygiene: Spark and DuckDB widen differently
  * (Spark floor→LONG, DuckDB floor→DOUBLE; DuckDB year()→BIGINT), so
  * every computed numeric is cast to BIGINT/DOUBLE explicitly on both
  * sides.
  */
object Scalars extends QueryModule {

  /** The standard base-32 geohash alphabet (no a/i/l/o). */
  private[graft] val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 2²⁰-cell axis quantization for q_geohash: 40 interleaved bits =
    * exactly 8 base-32 characters.
    */
  private[graft] def geohashCells(lat: org.apache.spark.sql.Column,
      lon: org.apache.spark.sql.Column): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    (floor((lat + 90.0) * 1048576.0 / 180.0),
      floor((lon + 180.0) * 1048576.0 / 360.0))

  /** The 8-char geohash of pre-quantized (clat, clon) cells: the
    * longitude-first bit interleave then 5-bit base-32 chunks — all
    * integer bit arithmetic (shared by the declared query and the
    * known-value/round-trip spec).
    */
  private[graft] def geohash8(clat: org.apache.spark.sql.Column,
      clon: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val g = (0 until 20).map { i =>
      shiftleft(shiftrightunsigned(clon, 19 - i)
        .bitwiseAND(lit(1L)), 39 - 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(clat, 19 - i)
          .bitwiseAND(lit(1L)), 38 - 2 * i))
    }.reduce(_.bitwiseOR(_))
    val chars = array(GeohashAlphabet.map(c => lit(c.toString)): _*)
    concat((0 until 8).map { p =>
      element_at(chars,
        shiftrightunsigned(g, 35 - 5 * p).bitwiseAND(lit(31L)).cast("int") + 1)
    }: _*)
  }

  def entries: Map[String, QueryDef] = Map(

    // String surface: concat/upper/lower/substring/replace/length.
    "q_str_funcs" -> QueryDef(
      (s, dir) => Tables(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lower(col("c_mktsegment")).as("seg_lower"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("name_seg"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("name_short"),
          length(col("c_name")).cast("long").as("name_len"),
          col("c_name").startsWith("Customer").cast("int").as("is_customer"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  upper(c_name) AS name_upper,
             |  lower(c_mktsegment) AS seg_lower,
             |  substr(c_name, 1, 8) AS name_prefix,
             |  concat_ws('|', c_name, c_mktsegment) AS name_seg,
             |  replace(c_name, 'Customer', 'Cust') AS name_short,
             |  CAST(length(c_name) AS BIGINT) AS name_len,
             |  CAST(starts_with(c_name, 'Customer') AS INT) AS is_customer
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // CSV split + explode (env.sh:24 `tr , " "` + word loop): a
    // Generator (UDTF shape) feeding an aggregation.
    "q_split_explode" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "word"),
      Some("""SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt FROM (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
             |  FROM documents WHERE doc_id < 20)
             |GROUP BY doc_id, word ORDER BY doc_id, word""".stripMargin)),

    // ClickHouse `LEFT ARRAY JOIN` ([CH]): the explode that KEEPS
    // rows whose array is empty (a plain ARRAY JOIN / explode drops
    // them — silently losing every document without a match, the
    // classic denominator bug in per-doc rates). `explode_outer`
    // preserves them with a NULL element, coalesced to a sentinel so
    // both engines order/dedup identically. Same zero-shuffle explode
    // + doc-keyed re-aggregation shape as q_split_explode.
    "q_array_join_left" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode_outer(filter(split(col("text"), " "), w => length(w) >= 8)).as("w8"))
        .groupBy(col("doc_id"), coalesce(col("w8"), lit("(none)")).as("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "token"),
      Some("""SELECT doc_id, coalesce(u.w, '(none)') AS token,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT doc_id,
             |        list_filter(string_split(text, ' '), w -> length(w) >= 8) AS ws
             |      FROM documents) d
             |LEFT JOIN LATERAL (SELECT unnest(ws) AS w) u ON TRUE
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // The four bucket templates of backup.sh:26–29 + calendar parts.
    // Day-keyed week bucket via date_trunc('week') plus the literal ISO
    // `%G%V` bucket (Retention.bucketWeekIso — week-year from the
    // Thursday-of-week identity), oracle-checked against DuckDB's
    // native strftime('%G%V') including year-boundary rows.
    "q_date_funcs" -> QueryDef(
      // fanOut: five per-row date_format calls on a single-split scan
      // ran in ONE task (r15 profile); scale-adaptive redistribution —
      // identity at production split counts (see Tables.fanOut)
      (s, dir) => Tables.fanOut(Tables(s, dir, "orders"), col("o_orderkey"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyyMMdd-HHmmss").as("bucket_instant"),
          date_format(col("o_orderdate"), "yyyyMMdd").as("bucket_day"),
          date_format(date_trunc("week", col("o_orderdate")), "yyyyMMdd").as("bucket_week"),
          graft.operators.Retention.bucketWeekIso(col("o_orderdate")).as("bucket_week_iso"),
          date_format(col("o_orderdate"), "yyyyMM").as("bucket_month"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y%m%d-%H%M%S') AS bucket_instant,
             |  strftime(o_orderdate, '%Y%m%d') AS bucket_day,
             |  strftime(date_trunc('week', o_orderdate), '%Y%m%d') AS bucket_week,
             |  strftime(o_orderdate, '%G%V') AS bucket_week_iso,
             |  strftime(o_orderdate, '%Y%m') AS bucket_month,
             |  CAST(year(o_orderdate) AS BIGINT) AS y,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
             |  CAST(month(o_orderdate) AS BIGINT) AS m,
             |  CAST(day(o_orderdate) AS BIGINT) AS dom,
             |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Retention arithmetic (env.sh:26–29: weeks*7+1, months*31+1) +
    // numeric functions.
    // ClickHouse rounding family ([CH] roundBankers / roundToExp2 /
    // roundDuration / roundAge): banker's rounding on EXACT binary
    // halves (p_size/2 — every tie is a true .5, so Spark's `bround`
    // and DuckDB's `round_even` cannot diverge on representation),
    // and the three bucketing ladders as CASE chains — identical
    // integer arithmetic on both engines, zero-shuffle projection.
    "q_round_funcs" -> QueryDef(
      (s, dir) => {
        val size = col("p_size")
        val secs = (size * 73) % 4000
        Tables(s, dir, "part")
          .select(col("p_partkey"),
            bround(size / 2.0, 0).cast("long").as("bankers_half"),
            when(size >= 32, 32L).when(size >= 16, 16L).when(size >= 8, 8L)
              .when(size >= 4, 4L).when(size >= 2, 2L).when(size >= 1, 1L)
              .otherwise(0L).as("exp2_floor"),
            when(secs >= 3600, 3600L).when(secs >= 1800, 1800L)
              .when(secs >= 1200, 1200L).when(secs >= 600, 600L)
              .when(secs >= 300, 300L).when(secs >= 240, 240L)
              .when(secs >= 180, 180L).when(secs >= 120, 120L)
              .when(secs >= 60, 60L).when(secs >= 30, 30L)
              .when(secs >= 10, 10L).when(secs >= 1, 1L)
              .otherwise(0L).as("duration_bucket"),
            when(size >= 55, 55L).when(size >= 45, 45L).when(size >= 35, 35L)
              .when(size >= 25, 25L).when(size >= 18, 18L).when(size >= 1, 17L)
              .otherwise(0L).as("age_bucket"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CAST(round_even(p_size / 2.0, 0) AS BIGINT) AS bankers_half,
             |  CAST(CASE WHEN p_size >= 32 THEN 32 WHEN p_size >= 16 THEN 16
             |            WHEN p_size >= 8 THEN 8 WHEN p_size >= 4 THEN 4
             |            WHEN p_size >= 2 THEN 2 WHEN p_size >= 1 THEN 1
             |            ELSE 0 END AS BIGINT) AS exp2_floor,
             |  CAST(CASE WHEN s >= 3600 THEN 3600 WHEN s >= 1800 THEN 1800
             |            WHEN s >= 1200 THEN 1200 WHEN s >= 600 THEN 600
             |            WHEN s >= 300 THEN 300 WHEN s >= 240 THEN 240
             |            WHEN s >= 180 THEN 180 WHEN s >= 120 THEN 120
             |            WHEN s >= 60 THEN 60 WHEN s >= 30 THEN 30
             |            WHEN s >= 10 THEN 10 WHEN s >= 1 THEN 1
             |            ELSE 0 END AS BIGINT) AS duration_bucket,
             |  CAST(CASE WHEN p_size >= 55 THEN 55 WHEN p_size >= 45 THEN 45
             |            WHEN p_size >= 35 THEN 35 WHEN p_size >= 25 THEN 25
             |            WHEN p_size >= 18 THEN 18 WHEN p_size >= 1 THEN 17
             |            ELSE 0 END AS BIGINT) AS age_bucket
             |FROM (SELECT p_partkey, p_size, (p_size * 73) % 4000 AS s FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // Encoding/codec scalar family ([CH] base64Encode / base64Decode /
    // hex / unhex / bin / bitCount): byte-level codecs over the UTF-8
    // bytes of character substrings — both engines slice by CHARACTER
    // then encode the slice's bytes, so multibyte text cannot diverge.
    // The decode round trip exercises the inverse pair end-to-end.
    // Zero-shuffle codegen'd projection (+ the deterministic output
    // sort), like the rest of the scalar families.
    "q_codec_funcs" -> QueryDef(
      (s, dir) => {
        val head12 = substring(col("text"), 1, 12)
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            base64(head12.cast("binary")).as("b64"),
            (unbase64(base64(head12.cast("binary"))).cast("string") === head12)
              .as("rt_ok"),
            hex(substring(col("text"), 1, 4).cast("binary")).as("hex4"),
            bit_count(col("n_chars")).cast("long").as("bits"),
            bin(col("n_chars")).as("bits_str"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  base64(encode(substr(text, 1, 12))) AS b64,
             |  decode(from_base64(base64(encode(substr(text, 1, 12))))) = substr(text, 1, 12) AS rt_ok,
             |  hex(encode(substr(text, 1, 4))) AS hex4,
             |  CAST(bit_count(n_chars) AS BIGINT) AS bits,
             |  bin(n_chars) AS bits_str
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "q_math_funcs" -> QueryDef(
      (s, dir) => Tables(s, dir, "part")
        .select(col("p_partkey"),
          (col("p_size") * 7 + 1).cast("long").as("weeks_days"),
          (col("p_size") * 31 + 1).cast("long").as("months_days"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          round(col("p_retailprice") * 1.1, 2).as("price_bumped"),
          abs(col("p_size") - 25).cast("long").as("size_dev"),
          pmod(col("p_partkey"), lit(7)).cast("long").as("key_mod"),
          round(sqrt(col("p_retailprice")), 4).as("price_sqrt"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  CAST(p_size * 7 + 1 AS BIGINT) AS weeks_days,
             |  CAST(p_size * 31 + 1 AS BIGINT) AS months_days,
             |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
             |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
             |  round(p_retailprice * 1.1, 2) AS price_bumped,
             |  CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
             |  CAST(p_partkey % 7 AS BIGINT) AS key_mod,
             |  round(sqrt(p_retailprice), 4) AS price_sqrt
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // JSON-in-string extraction (events.props, FIXTURES.md): typed get.
    "q_json_get" -> QueryDef(
      // fanOut: per-row JSON-path parse on a single-split scan (r15)
      (s, dir) => Tables.fanOut(Relational.eventsSec(s, dir), col("event_id"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // ClickHouse URL family (domain / path / extractURLParameter): the
    // fixtures carry no URLs, so — same trick as q_pii_scrub — a URL
    // is synthesized deterministically from event fields on BOTH
    // engines, then parsed back with identical regexes (Java ∩ RE2
    // dialect). Row-local codegen'd projection, zero shuffle.
    "q_url_funcs" -> QueryDef(
      (s, dir) => {
        val url = concat(
          lit("https://shop"), pmod(col("user_id"), lit(10L)).cast("string"),
          lit(".example.com/"), col("event_type"),
          lit("/p"), pmod(col("event_id"), lit(100L)).cast("string"),
          lit("?ref=r"), pmod(col("event_id"), lit(7L)).cast("string"))
        // fanOut: three regex extracts per row on a single-split scan
        // ran in ONE task (r15 profile); scale-adaptive
        Tables.fanOut(Relational.eventsSec(s, dir), col("event_id"))
          .select(col("event_id"), url.as("url"))
          .select(col("event_id"),
            regexp_extract(col("url"), "^https?://([^/]+)", 1).as("host"),
            regexp_extract(col("url"), "^https?://[^/]+(/[^?]*)", 1).as("path"),
            regexp_extract(col("url"), "ref=([^&]+)", 1).as("ref"))
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT event_id,
             |    'https://shop' || CAST(user_id % 10 AS VARCHAR) || '.example.com/' ||
             |    event_type || '/p' || CAST(event_id % 100 AS VARCHAR) ||
             |    '?ref=r' || CAST(event_id % 7 AS VARCHAR) AS url
             |  FROM events)
             |SELECT event_id,
             |  regexp_extract(url, '^https?://([^/]+)', 1) AS host,
             |  regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
             |  regexp_extract(url, 'ref=([^&]+)', 1) AS ref
             |FROM u ORDER BY event_id""".stripMargin)),

    // Array surface over the 64-dim embeddings: size / element access /
    // L2 norm via higher-order fold (no UDF — stays in codegen).
    "q_array_funcs" -> QueryDef(
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          // + 0.0 canonicalizes IEEE negative zero (−0.0 + 0.0 = +0.0):
          // one sf0.1 vector rounds to zero from below and the engines
          // disagree on the sign of the result
          (round(element_at(col("embedding"), 1).cast("double"), 4) + 0.0).as("first_elem"),
          round(sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)), 4).as("l2_norm"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS BIGINT) AS dim,
             |  round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_elem,
             |  round(sqrt(list_sum(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Map type support ([CH] nested types): build a map from the JSON
    // props, then read keys/values back. The map itself is emitted as
    // a CANONICAL string — sorted key=value entries joined with the
    // 0x1f unit separator (the q_agg_sum_map trick) — so the whole
    // map, not just its first entry, is hash-checked against DuckDB's
    // JSON surface.
    "q_map_funcs" -> QueryDef(
      // fanOut: per-row JSON parsing on a single-split scan ran in ONE
      // task (r15 profile); scale-adaptive (see Tables.fanOut)
      (s, dir) => Tables.fanOut(Relational.eventsSec(s, dir), col("event_id"))
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("props_map"))
        .select(col("event_id"),
          map_keys(col("props_map")).getItem(0).as("first_key"),
          map_values(col("props_map")).getItem(0).as("first_value"),
          try_element_at(col("props_map"), lit("k")).as("k_value"),
          size(col("props_map")).cast("long").as("n_keys"),
          array_join(sort_array(transform(map_entries(col("props_map")),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("string")))), "\u001f").as("map_canon"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  json_keys(props)[1] AS first_key,
             |  CAST(json_extract_string(props, '$.' || json_keys(props)[1]) AS BIGINT) AS first_value,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
             |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
             |  array_to_string(list_sort(list_transform(json_keys(props),
             |    k -> k || '=' || json_extract_string(props, '$.' || k))), chr(31)) AS map_canon
             |FROM events ORDER BY event_id""".stripMargin)),

    // ClickHouse arrayCumSum / arrayDifference + multi-array ARRAY
    // JOIN ([CH]): each user's time-ordered value array is built once
    // (array_sort over the collected (ts, id, value) structs — order
    // deterministic under ties), prefix sums and first differences
    // are computed ROW-LOCALLY by codegen'd higher-order folds
    // (aggregate / zip_with — the sequential fold adds in exactly the
    // oracle's window order, so the doubles are bit-identical), and
    // the three parallel arrays explode back in lockstep
    // (posexplode ∘ arrays_zip — ClickHouse's multi-column ARRAY
    // JOIN). One shuffle on the user key; everything after is
    // per-row.
    "q_array_cumsum" -> QueryDef(
      (s, dir) => {
        val arr = Relational.eventsSec(s, dir)
          .groupBy("user_id")
          .agg(expr(
            "transform(array_sort(collect_list(struct(ts_s, event_id, value))), x -> x.value)")
            .as("v"))
        arr
          .withColumn("cum", expr(
            """aggregate(v, CAST(array() AS ARRAY<DOUBLE>),
              |  (acc, x) -> array_append(acc, coalesce(try_element_at(acc, -1), 0D) + x))"""
              .stripMargin))
          .withColumn("diff", expr(
            "zip_with(v, concat(array(0D), slice(v, 1, size(v) - 1)), (a, b) -> a - b)"))
          .select(col("user_id"), expr("posexplode(arrays_zip(v, cum, diff))"))
          .select(col("user_id"), (col("pos") + 1).cast("long").as("idx"),
            round(col("col.v"), 4).as("v"),
            round(col("col.cum"), 4).as("cum"),
            round(col("col.diff"), 4).as("diff"))
          .orderBy("user_id", "idx")
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, value
             |  FROM events),
             |w AS (
             |  SELECT user_id,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS BIGINT) AS idx,
             |    round(value, 4) AS v,
             |    round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum,
             |    round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id), 0), 4) AS diff
             |  FROM e)
             |SELECT * FROM w ORDER BY user_id, idx""".stripMargin)),

    // ClickHouse IPv4NumToString/IPv4StringToNum/range-prefix family
    // ([CH] — ClickHouse ships ~20 IP functions; the backed-up tables
    // routinely carry packed IPv4 columns). The fixtures have no IP
    // column, so a deterministic packed address derives from the event
    // keys row-locally; the query then exercises the full round trip:
    // num → dotted-quad string → num, plus the /16 network prefix.
    // Pure codegen'd integer/string projection — zero shuffle.
    "q_ip_funcs" -> QueryDef(
      (s, dir) => {
        val src = Relational.eventsSec(s, dir)
          .select(col("event_id"),
            (lit(167772160L) + (col("user_id") % 256) * 65536
              + ((col("event_id") / 256).cast("long") % 256) * 256
              + col("event_id") % 256).as("ipnum"))
        val withStr = src.withColumn("ipstr", concat_ws(".",
          expr("ipnum div 16777216"),
          expr("(ipnum div 65536) % 256"),
          expr("(ipnum div 256) % 256"),
          col("ipnum") % 256))
        withStr.select(
          col("event_id"), col("ipnum").cast("long").as("ipnum"), col("ipstr"),
          (split(col("ipstr"), "\\.").getItem(0).cast("long") * 16777216
            + split(col("ipstr"), "\\.").getItem(1).cast("long") * 65536
            + split(col("ipstr"), "\\.").getItem(2).cast("long") * 256
            + split(col("ipstr"), "\\.").getItem(3).cast("long")).as("rt"),
          expr("CAST(ipnum div 65536 AS BIGINT)").as("net16"))
          .orderBy("event_id")
      },
      Some("""WITH src AS (
             |  SELECT event_id,
             |    167772160 + (user_id % 256) * 65536
             |      + ((event_id // 256) % 256) * 256 + event_id % 256 AS ipnum
             |  FROM events),
             |s AS (
             |  SELECT event_id, ipnum,
             |    CAST(ipnum // 16777216 AS VARCHAR) || '.' ||
             |    CAST((ipnum // 65536) % 256 AS VARCHAR) || '.' ||
             |    CAST((ipnum // 256) % 256 AS VARCHAR) || '.' ||
             |    CAST(ipnum % 256 AS VARCHAR) AS ipstr
             |  FROM src)
             |SELECT event_id, CAST(ipnum AS BIGINT) AS ipnum, ipstr,
             |  CAST(split_part(ipstr,'.',1) AS BIGINT)*16777216
             |    + CAST(split_part(ipstr,'.',2) AS BIGINT)*65536
             |    + CAST(split_part(ipstr,'.',3) AS BIGINT)*256
             |    + CAST(split_part(ipstr,'.',4) AS BIGINT) AS rt,
             |  CAST(ipnum // 65536 AS BIGINT) AS net16
             |FROM s ORDER BY event_id""".stripMargin)),

    // ClickHouse greatCircleDistance ([CH] geo family): haversine
    // distance in km between each supplier's synthetic coordinates and
    // its nation's anchor point (the fixtures carry no lat/lon, so
    // both derive deterministically from the keys — the formula under
    // test is the spherical trig, identical on both engines). The
    // 25-row nation dimension broadcasts; the trig itself is a
    // row-local codegen'd projection.
    "q_geo_funcs" -> QueryDef(
      (s, dir) => {
        val sup = Tables(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"),
            ((col("s_suppkey") % 170).cast("double") - 85 + 0.5).as("lat1"),
            (((col("s_suppkey") * 7) % 350).cast("double") - 175 + 0.5).as("lon1"))
        val nat = Tables(s, dir, "nation")
          .select(col("n_nationkey"),
            ((col("n_nationkey") * 6).cast("double") - 72).as("lat2"),
            ((col("n_nationkey") * 13).cast("double") - 160).as("lon2"))
        sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"),
            round(lit(2) * lit(6371000.0) * asin(sqrt(
              pow(sin(radians(col("lat2") - col("lat1")) / 2), 2)
                + cos(radians(col("lat1"))) * cos(radians(col("lat2")))
                * pow(sin(radians(col("lon2") - col("lon1")) / 2), 2)))
              / 1000, 4).as("dist_km"))
          .orderBy("s_suppkey")
      },
      Some("""WITH sup AS (
             |  SELECT s_suppkey, s_nationkey,
             |    CAST(s_suppkey % 170 AS DOUBLE) - 85 + 0.5 AS lat1,
             |    CAST((s_suppkey * 7) % 350 AS DOUBLE) - 175 + 0.5 AS lon1
             |  FROM supplier),
             |nat AS (
             |  SELECT n_nationkey,
             |    CAST(n_nationkey * 6 AS DOUBLE) - 72 AS lat2,
             |    CAST(n_nationkey * 13 AS DOUBLE) - 160 AS lon2
             |  FROM nation)
             |SELECT s_suppkey,
             |  round(2 * 6371000 * asin(sqrt(
             |    pow(sin(radians(lat2 - lat1)/2), 2)
             |    + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1)/2), 2)
             |  )) / 1000, 4) AS dist_km
             |FROM sup JOIN nat ON s_nationkey = n_nationkey
             |ORDER BY s_suppkey""".stripMargin)),

    // ClickHouse `pointInPolygon` — even-odd ray casting against a
    // fixed non-convex polygon, fully row-local (one strict-inequality
    // crossing test per edge, edge count bounded by the polygon — a
    // broadcast-scale constant, so the whole query is a zero-shuffle
    // projection at any corpus size). Determinism: customer coords sit
    // on the half-integer grid while every vertex is an integer, so
    // the py≠vertex-y comparisons can never land on an edge endpoint;
    // the crossing-x division is the same IEEE expression text on
    // both engines.
    "q_geo_polygon" -> QueryDef(
      (s, dir) => {
        val poly = Seq((-120.0, -60.0), (40.0, -70.0), (150.0, -10.0),
          (60.0, 20.0), (110.0, 75.0), (-30.0, 40.0), (-150.0, 50.0))
        val px = col("lon"); val py = col("lat")
        val crossings = poly.indices.map { i =>
          val (x1, y1) = poly(i)
          val (x2, y2) = poly((i + 1) % poly.size)
          when((lit(y1) > py) =!= (lit(y2) > py),
            when(px < (lit(x2) - lit(x1)) * (py - lit(y1)) / (lit(y2) - lit(y1)) + lit(x1),
              lit(1L)).otherwise(lit(0L))).otherwise(lit(0L))
        }.reduce(_ + _)
        Tables(s, dir, "customer")
          .select(col("c_custkey"),
            ((col("c_custkey") % 170).cast("double") - 85 + 0.5).as("lat"),
            (((col("c_custkey") * 7) % 350).cast("double") - 175 + 0.5).as("lon"))
          .withColumn("inside", (crossings % 2).cast("long"))
          .orderBy("c_custkey")
      },
      Some {
        val poly = Seq((-120.0, -60.0), (40.0, -70.0), (150.0, -10.0),
          (60.0, 20.0), (110.0, 75.0), (-30.0, 40.0), (-150.0, 50.0))
        val terms = poly.indices.map { i =>
          val (x1, y1) = poly(i)
          val (x2, y2) = poly((i + 1) % poly.size)
          s"""CASE WHEN ($y1 > lat) <> ($y2 > lat)
             |  THEN CASE WHEN lon < ($x2 - $x1) * (lat - $y1) / ($y2 - $y1) + $x1
             |    THEN 1 ELSE 0 END ELSE 0 END""".stripMargin
        }.mkString(" + ")
        s"""WITH c AS (
           |  SELECT c_custkey,
           |    CAST(c_custkey % 170 AS DOUBLE) - 85 + 0.5 AS lat,
           |    CAST((c_custkey * 7) % 350 AS DOUBLE) - 175 + 0.5 AS lon
           |  FROM customer)
           |SELECT c_custkey, lat, lon,
           |  CAST(($terms) % 2 AS BIGINT) AS inside
           |FROM c ORDER BY c_custkey""".stripMargin
      }),

    // ClickHouse ngramDistance ([CH] string-similarity family):
    // character-bigram Jaccard between each customer's name and the
    // NEXT customer's (adjacent serial names share most of their
    // digit bigrams — a non-degenerate similarity distribution with no
    // synthetic pairing). The pairing is a key-shifted equi self-join
    // (co-partitioned shuffle, no window over the whole table); the
    // set algebra is row-local `array_intersect` on distinct-bigram
    // arrays. CASE-guards the sub-2-char degenerate input (Spark's
    // `sequence(1, 0)` would DESCEND, not return empty).
    "q_str_ngram_sim" -> QueryDef(
      (s, dir) => {
        def bigrams(c: String): org.apache.spark.sql.Column =
          expr(s"""CASE WHEN length($c) < 2 THEN CAST(array() AS ARRAY<STRING>)
                  |ELSE array_distinct(transform(sequence(1, length($c) - 1),
                  |  i -> substring($c, i, 2))) END""".stripMargin)
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey"), upper(col("c_name")).as("nm"))
        val nxt = cust.select((col("c_custkey") - 1).as("k"), col("nm").as("nm2"))
        cust.join(nxt, col("c_custkey") === col("k"))
          .select(col("c_custkey"),
            bigrams("nm").as("ga"), bigrams("nm2").as("gb"))
          .select(col("c_custkey"),
            size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_common"),
            round(size(array_intersect(col("ga"), col("gb"))).cast("double")
              / (size(col("ga")) + size(col("gb"))
                - size(array_intersect(col("ga"), col("gb")))), 4).as("jaccard"))
          .orderBy("c_custkey")
      },
      Some("""WITH pairs AS (
             |  SELECT x.c_custkey, upper(x.c_name) AS a, upper(y.c_name) AS b
             |  FROM customer x JOIN customer y ON y.c_custkey = x.c_custkey + 1),
             |sets AS (
             |  SELECT c_custkey,
             |    list_distinct(list_transform(range(1, length(a)), i -> substr(a, CAST(i AS INT), 2))) AS ga,
             |    list_distinct(list_transform(range(1, length(b)), i -> substr(b, CAST(i AS INT), 2))) AS gb
             |  FROM pairs)
             |SELECT c_custkey,
             |  CAST(len(list_intersect(ga, gb)) AS BIGINT) AS n_common,
             |  round(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
             |    / (len(ga) + len(gb) - len(list_intersect(ga, gb))), 4) AS jaccard
             |FROM sets ORDER BY c_custkey""".stripMargin)),

    // ClickHouse geohashEncode/geohashDecode ([CH] geo family): the
    // standard 8-character geohash (40 bits: 20 longitude + 20
    // latitude, longitude first, base-32 "0123...z" alphabet) over the
    // q_geo_funcs synthetic supplier coordinates, plus the decoded
    // cell center. Zero-shuffle codegen'd projection — a free column
    // during any corpus pass. Determinism is EXACT, no rounding grid
    // needed for the hash itself: the half-integer-grid coordinates
    // make (coord + offset) · 2²⁰ an exact integer-valued double, the
    // single IEEE division by the span is correctly rounded
    // identically on both engines, and everything after floor() is
    // integer bit arithmetic. The decoded center is likewise exact
    // ((cell + 0.5) · span is exact, / 2²⁰ is a power-of-two scale).
    "q_geohash" -> QueryDef(
      (s, dir) => {
        val (clatC, clonC) = geohashCells(col("lat"), col("lon"))
        val sup = Tables(s, dir, "supplier")
          .select(col("s_suppkey"),
            ((col("s_suppkey") % 170).cast("double") - 85 + 0.5).as("lat"),
            (((col("s_suppkey") * 7) % 350).cast("double") - 175 + 0.5).as("lon"))
          .withColumn("clat", clatC)
          .withColumn("clon", clonC)
        sup
          .select(col("s_suppkey"),
            geohash8(col("clat"), col("clon")).as("geohash"),
            round((col("clat") + 0.5) * 180.0 / 1048576.0 - 90.0, 6)
              .as("lat_dec"),
            round((col("clon") + 0.5) * 360.0 / 1048576.0 - 180.0, 6)
              .as("lon_dec"))
          .orderBy("s_suppkey")
      },
      Some {
        val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        val gExpr = (0 until 20).map { i =>
          s"(((clon >> ${19 - i}) & 1) << ${39 - 2 * i}) | " +
            s"(((clat >> ${19 - i}) & 1) << ${38 - 2 * i})"
        }.mkString(" | ")
        val ghExpr = (0 until 8).map { p =>
          s"substr('$alphabet', CAST((g >> ${35 - 5 * p}) & 31 AS INTEGER) + 1, 1)"
        }.mkString(" || ")
        s"""WITH sup AS (
           |  SELECT s_suppkey,
           |    CAST(s_suppkey % 170 AS DOUBLE) - 85 + 0.5 AS lat,
           |    CAST((s_suppkey * 7) % 350 AS DOUBLE) - 175 + 0.5 AS lon
           |  FROM supplier),
           |cells AS (
           |  SELECT s_suppkey,
           |    CAST(floor((lat + 90.0) * 1048576.0 / 180.0) AS BIGINT) AS clat,
           |    CAST(floor((lon + 180.0) * 1048576.0 / 360.0) AS BIGINT) AS clon
           |  FROM sup),
           |bits AS (
           |  SELECT s_suppkey, clat, clon, $gExpr AS g FROM cells)
           |SELECT s_suppkey, $ghExpr AS geohash,
           |  round((clat + 0.5) * 180.0 / 1048576.0 - 90.0, 6) AS lat_dec,
           |  round((clon + 0.5) * 360.0 / 1048576.0 - 180.0, 6) AS lon_dec
           |FROM bits ORDER BY s_suppkey""".stripMargin
      })
  )
}
