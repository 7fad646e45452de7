package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-function surface — SURVEY.md §2.8, the reference's "Transform:
  * clean or reformat the data" stage (/root/reference/README.md:22) plus
  * ingestion-timestamp handling (README.md:28, 99).
  *
  * Everything here is a built-in Catalyst expression — codegen'd,
  * null-safe, pushdown-transparent. No UDFs: a UDF in this layer would
  * break whole-stage codegen and hide predicates from the parquet scan.
  * One query per family, each over the designated semi-structured tables
  * (`events.props` is the JSON-string column; `documents.text` the corpus).
  */
object FuncOps {

  /** String family: case, trim, substring, split, concat, pad, regex. */
  def stringFns(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        upper(col("lang")).as("lang_uc"),
        length(col("text")).as("text_len"),
        substring(col("text"), 1, 12).as("prefix"),
        element_at(split(col("text"), " "), 1).as("first_tok"),
        concat_ws("-", col("lang"), col("source")).as("lang_src"),
        lpad(col("lang"), 5, "*").as("lang_pad"),
        trim(lit("  pad  ")).as("trimmed"),
        instr(col("text"), "a").as("first_a"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("source"), "[0-9]+", "#").as("src_masked"))
      .orderBy("doc_id")

  /** Date/time family over the order date (stored TIMESTAMP_NTZ — cast to
    * session-tz timestamp is the identity under forced UTC). Epochs and
    * ISO strings in the output, never raw tz-sensitive values.
    */
  def datetimeFns(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_99"),
        col("o_orderdate").cast("timestamp").cast("long").as("epoch_s"))
      .orderBy("o_orderkey")

  /** Math family: rounding, clamping, powers, logs — numeric payload
    * normalization. Outputs rounded so cross-engine libm noise (≪1e-6)
    * cannot flip the hash compare.
    */
  def mathFns(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(pow(col("l_discount") + 1, 2), 6).as("disc_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        (col("l_quantity") % 7).cast("int").as("qty_mod"))
      .orderBy("l_orderkey", "l_linenumber")

  /** ANSI-safe TRY arithmetic family — `try_divide`/`try_add`/
    * `try_multiply` return NULL where strict ANSI evaluation would
    * raise (division by zero, overflow), the error-tolerant transform
    * contract a raw feed needs (README.md:32 "invalid values"): one bad
    * row must poison neither the task nor the job. Pure codegen'd
    * built-ins — same scan shape as every fn_* family.
    */
  def tryFns(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // quantity 7 constructs a real divide-by-zero every 7th row
        round(try_divide(col("l_extendedprice"), col("l_quantity") % 7), 6)
          .as("price_per_mod"),
        try_divide(col("l_quantity"), col("l_discount") - col("l_discount"))
          .as("always_null"),
        round(try_add(col("l_extendedprice"), col("l_tax")), 6).as("sum_ok"),
        round(try_multiply(col("l_extendedprice"), lit(0.5)), 6).as("half_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Conditional family: CASE chains, coalesce, nullif, nvl — the
    * invalid-value mapping stage (README.md:32).
    */
  def conditionalFns(customer: DataFrame): DataFrame =
    customer
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("RESIDENTIAL")).as("segment"),
        nvl(nullif(col("c_nationkey"), lit(0)), lit(-1)).as("nation_or_neg"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_clamped"))
      .orderBy("c_custkey")

  /** Array family incl. higher-order functions over the token list —
    * un/re-nesting JSON arrays (README.md:21–22). All lambdas are Catalyst
    * HigherOrderFunctions (codegen-adjacent, executor-side) — never a
    * driver loop.
    */
  def arrayFns(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    documents
      .select(
        col("doc_id"),
        size(toks).as("n_toks"),
        slice(sort_array(toks), 1, 3).as("first3_sorted"),
        sort_array(array_distinct(toks)).as("vocab"),
        array_contains(toks, "data").as("has_data"),
        size(filter(toks, t => length(t) > 4)).as("n_long"),
        aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("char_sum"),
        exists(toks, t => t === "the").as("has_the"))
      .orderBy("doc_id")
  }

  /** Fuzzy string matching: Levenshtein edit distance of each document's
    * prefix against a probe phrase, plus a normalized similarity — the
    * approximate-match step of entity resolution / dirty-key joins.
    */
  def fuzzyFns(documents: DataFrame): DataFrame = {
    val probe = "the quick brown"
    val prefix = substring(col("text"), 1, 15)
    val dist = levenshtein(prefix, lit(probe))
    documents
      .select(
        col("doc_id"),
        prefix.as("prefix"),
        dist.as("edit_dist"),
        round(lit(1.0) - dist.cast("double") / greatest(length(prefix), lit(probe.length)), 6)
          .as("similarity"))
      .orderBy("doc_id")
  }

  /** Map family: dynamic key→value JSON objects as MapType. Keys/values
    * extracted to arrays/scalars for the compare (map column layouts are
    * engine-specific).
    */
  def mapFns(events: DataFrame): DataFrame = {
    val m = map(
      lit("type"), col("event_type"),
      lit("uid"), col("user_id").cast("string"))
    events
      .select(
        col("event_id"),
        map_keys(m).as("ks"),
        map_values(m).as("vs"),
        element_at(m, "type").as("type_via_map"),
        size(m).as("n_entries"))
      .orderBy("event_id")
  }

  /** JSON family over `events.props` (the designated JSON-string column,
    * FIXTURES.md:38): schema-on-read extraction via path and via typed
    * from_json — the core reference transform (README.md:21–22).
    */
  def jsonFns(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_int"),
        (from_json(col("props"), lit("k INT")).getField("k") * 2).as("k_doubled"),
        length(col("props")).as("props_len"))
      .orderBy("event_id")

  /** Spark-4 COLLATION surface — comparison semantics as a TYPE property
    * instead of scattered lower() calls: mixed-case segment labels
    * (deterministically injected; the base data is single-case) group
    * under the UTF8_LCASE collation, and `n_case_variants = 2` PROVES
    * the merge happened at comparison level. The exported key is
    * lower()-normalized — collated grouping keeps an arbitrary
    * representative, and the export must not depend on which. The DuckDB
    * oracle replicates with lower() grouping (same partition of rows by
    * construction on this data).
    */
  def collationFns(customer: DataFrame): DataFrame = {
    val seg = when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
      .otherwise(col("c_mktsegment"))
    customer
      .select(col("c_custkey"), seg.as("seg"))
      .groupBy(expr("collate(seg, 'UTF8_LCASE')").as("seg_ci"))
      .agg(count(lit(1)).as("n"), countDistinct(col("seg")).as("n_case_variants"))
      .select(lower(col("seg_ci")).as("segment"), col("n"), col("n_case_variants"))
      .orderBy("segment")
  }

  /** URL parsing family — the log/clickstream-ETL staple. The corpus
    * carries no URLs, so deterministic synthetic ones are derived from
    * (doc_id, lang) — which also makes the oracle exact BY CONSTRUCTION:
    * DuckDB rebuilds each expected component from the same fields instead
    * of re-implementing a parser. `parse_url` is codegen'd map-side
    * string work; no shuffle before the presentation sort.
    */
  def urlFns(documents: DataFrame): DataFrame = {
    val url = concat(
      lit("https://host"), (col("doc_id") % 20).cast("string"),
      lit(".example.com/docs/"), col("doc_id").cast("string"),
      lit("?lang="), col("lang"), lit("&p=1"))
    documents
      .select(
        col("doc_id"),
        parse_url(url, lit("PROTOCOL")).as("proto"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("lang")).as("q_lang"))
      .orderBy("doc_id")
  }

  /** Spark-4 VARIANT ingestion — the semi-structured path that replaces
    * schema-on-write JSON wrangling at scale: `parse_json` turns the raw
    * string into a binary VARIANT once (columnar, no per-query re-parse),
    * `variant_get` extracts typed paths lazily, `is_variant_null` and
    * `schema_of_variant` expose the dynamic shape. The variant itself
    * never leaves the query (binary — driver-unhashable); everything
    * exported is a typed scalar, so the DuckDB oracle replicates with its
    * own JSON path functions.
    */
  /** BOUNDED Levenshtein (Spark 3.5+ 3-arg form) — the scale form of
    * edit distance: with a threshold the kernel abandons a row the
    * moment the distance provably exceeds it (O(k·n) banded DP instead
    * of O(n·m)), returning −1 — what a fuzzy-join verify stage wants,
    * since candidates beyond the cutoff need no exact distance. DuckDB
    * has no bounded form; the oracle applies the threshold to the full
    * distance, which is semantically identical.
    */
  def levenshteinBounded(nation: DataFrame, threshold: Int = 5): DataFrame = {
    val pairs = nation.select(col("n_nationkey").as("ka"), col("n_name").as("a"))
      .crossJoin(nation.select(col("n_nationkey").as("kb"), col("n_name").as("b")))
      .filter(col("ka") < col("kb"))
    pairs.select(col("ka"), col("kb"),
      levenshtein(col("a"), col("b"), threshold).as("lev_bounded"),
      (levenshtein(col("a"), col("b"), threshold) >= 0).as("within"))
      .orderBy("ka", "kb")
  }

  /** Rounding-mode semantics — `round` (HALF_UP) vs `bround` (HALF_EVEN,
    * banker's) side by side on exact .5 boundaries: the silent
    * financial-aggregation divergence every engine migration trips on.
    * Boundary values are CONSTRUCTED exactly (k + 0.5 with k integer —
    * representable in double), so both modes differ deterministically on
    * every odd k; DuckDB mirrors with round / round_even.
    */
  def roundingFns(orders: DataFrame): DataFrame = {
    // exact k.5 values: o_orderkey + 0.5 is exact in double
    val half = col("o_orderkey").cast("double") + 0.5
    orders
      .filter(col("o_orderkey") <= 50)
      .select(
        col("o_orderkey"),
        half.as("boundary"),
        round(half, 0).as("half_up"),
        bround(half, 0).as("half_even"),
        (round(half, 0) =!= bround(half, 0)).as("modes_differ"))
      .orderBy("o_orderkey")
  }

  /** Nested-struct surgery — `withField` / `dropFields` (Spark 3.1+),
    * the in-place document-update API a Mongo-shaped pipeline edits
    * nested records with (vs rebuilding the whole struct by hand). All
    * analysis-time projections: the optimizer flattens the chain of
    * edits into one map-side struct rebuild — no shuffle, no UDF. The
    * audit re-expands the edited struct to plain columns so the oracle
    * sees through the nesting (struct layout is the tested behavior:
    * field ADDED, field UPDATED, field DROPPED, order preserved).
    */
  def structFns(customer: DataFrame): DataFrame = {
    // amounts ride as integer cents inside the struct: the JSON audit
    // byte-compares, and float formatting is engine-specific (the
    // sink_doc_shape rule)
    val doc = struct(
      col("c_custkey").as("key"),
      col("c_mktsegment").as("segment"),
      round(col("c_acctbal") * 100).cast("long").as("balance_cents"),
      col("c_nationkey").as("nation"))
    customer
      .select(col("c_custkey"), doc.as("doc"))
      // update one field, add one, drop one — the document-edit triple
      .withColumn("doc", col("doc")
        .withField("segment", lower(col("doc.segment")))
        .withField("band",
          when(col("doc.balance_cents") < 0, "overdrawn")
            .when(col("doc.balance_cents") < 500000, "standard")
            .otherwise("premium"))
        .dropFields("nation"))
      .select(
        col("c_custkey"),
        col("doc.key").as("key"),
        col("doc.segment").as("segment"),
        col("doc.balance_cents").as("balance_cents"),
        col("doc.band").as("band"),
        to_json(col("doc")).as("doc_json"))
      .orderBy("c_custkey")
  }

  def variantFns(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
        expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
        expr("variant_get(parse_json(props), '$.missing', 'int')").as("missing_int"),
        expr("is_variant_null(variant_get(parse_json(props), '$.k'))").as("k_is_null"),
        expr("schema_of_variant(parse_json(props))").as("v_schema"))
      .orderBy("event_id")

  /** Bitwise family — the key-packing / partition-salt arithmetic behind
    * composite ids, Morton interleaves (sink_zorder) and salt buckets:
    * and/or/xor, shifts, popcount — all codegen'd integer ops, pure
    * map-side. Oracle notes: DuckDB's `^` is POWER, so its SQL spells
    * `xor()`; its `bit_count` returns TINYINT where Spark's is INT, so
    * the oracle casts.
    */
  def bitwiseFns(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("and_low"),
        col("l_orderkey").bitwiseOR(lit(16L)).as("or_flag"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("xor_mix"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        shiftright(col("l_orderkey"), 4).as("shr"),
        bit_count(col("l_orderkey")).as("popcount"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Hash/ID family: stable record keys for upsert (README.md:28).
    * sha2/md5 per row are oracle-exact against DuckDB sha256/md5;
    * xxhash64 has no DuckDB twin — its injectivity on this corpus is
    * asserted in the scalatest spec instead (64-bit collisions at this
    * cardinality ≈ 0).
    */
  def hashFns(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        sha2(col("text"), 256).as("sha"),
        md5(col("text")).as("mdfive"))
      .orderBy("doc_id")

  /** Regex family beyond the single-match basics `fn_string` carries:
    * count, global replace, and extract-ALL — the workhorses of text
    * cleaning at corpus scale (all codegen'd Catalyst expressions; a
    * regex UDF here would be the classic 10× mistake). The extract-all
    * list is re-joined to a string so the compare is a flat column.
    * Oracle notes: DuckDB's `regexp_replace` is FIRST-match unless
    * passed the 'g' flag (Spark's is always global), and its extract-all
    * list becomes `array_to_string`; both engines speak RE2-compatible
    * syntax for the classes used here.
    */
  def regexpFns(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit("[aeiou][aeiou]")).as("n_vv"),
        regexp_extract(col("text"), "([a-z]{8,})", 1).as("first_long"),
        regexp_replace(col("text"), lit("[aeiou]"), lit("_")).as("devoweled"),
        array_join(
          regexp_extract_all(col("text"), lit("\\b[a-z]{3}\\b"), lit(0)), "|")
          .as("three_letter"))
      .orderBy("doc_id")

  /** Binary/text encoding family — base64 and hex for blob transport
    * (the wire form a JSON API hands binary payloads in, README.md:21),
    * plus ascii/chr codepoint access. Round-trips prove losslessness;
    * all map-side codegen'd.
    */
  def encodingFns(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        // Spark's base64 is RFC2045 (MIME) — 76-char lines joined by
        // CRLF; strip the wrapping for the canonical unchunked form
        regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "")
          .as("b64"),
        unbase64(base64(col("text").cast("binary"))).cast("string").as("b64_rt"),
        hex(col("text").cast("binary")).as("hx"),
        ascii(col("text")).as("first_code"),
        chr(ascii(col("text"))).as("first_char"))
      .orderBy("doc_id")

  /** Ordered string aggregation (Spark 4 `LISTAGG … WITHIN GROUP`) — the
    * report/export shape every warehouse user types (CSV cell of member
    * ids, breadcrumb of statuses). The WITHIN GROUP order is the whole
    * contract: an unordered listagg is nondeterministic under ANY
    * parallelism, so the deterministic form is the only one that can be
    * oracle-paired — or trusted in production output at all. Cost: one
    * hash aggregate; per-group strings stay bounded by group size.
    */
  def listaggFns(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), col("doc_id"),
        substring(col("text"), 1, 8).as("prefix"))
      .groupBy(col("lang"))
      .agg(
        expr("listagg(prefix, '|') WITHIN GROUP (ORDER BY doc_id)")
          .as("prefixes"),
        count(lit(1)).as("n"))
      .orderBy("lang")

  /** Built-in data masking (`mask()`) — the display-layer PII guard
    * (README.md:21 secure handling; complements `text_pii_mask`'s regex
    * redaction and `fn_aes`'s at-rest encryption): case class and digit
    * CLASS survive, values don't. Default charset and a custom charset
    * (others collapsed to '*') both exercised; map-side codegen'd.
    */
  def maskFns(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        mask(concat(upper(substring(col("text"), 1, 6)),
          lit(" Doc"), col("doc_id").cast("string"))).as("masked_default"),
        mask(col("source"), lit("A"), lit("a"), lit("9"), lit("*"))
          .as("masked_custom"))
      .orderBy("doc_id")

  /** Column-level encryption — PII protection AT REST for the secure-
    * handling mandate (README.md:21 "secure token", :88 secrets hygiene):
    * AES-GCM encrypt → decrypt round-trips the payload (GCM's random IV
    * makes ciphertext non-deterministic, which is the POINT — equal
    * plaintexts must not correlate at rest), and a wrong-key decrypt
    * fails CLOSED: `try_aes_decrypt` yields NULL, never garbage bytes —
    * GCM authenticates before it decrypts. Both properties are data-
    * visible and oracle-checked; the ciphertext itself never leaves the
    * engine. Scale: per-row cipher work is map-side codegen'd expression
    * evaluation, embarrassingly parallel.
    */
  def aesFns(documents: DataFrame): DataFrame = {
    val key = lit("0123456789abcdef") // 16-byte demo key; prod = dotenv/KMS
    val wrongKey = lit("fedcba9876543210")
    val ct = aes_encrypt(col("text"), key, lit("GCM"))
    documents
      .select(
        col("doc_id"),
        aes_decrypt(ct, key, lit("GCM")).cast("string").as("text_rt"),
        try_aes_decrypt(ct, wrongKey, lit("GCM")).isNull
          .as("wrong_key_rejected"))
      .orderBy("doc_id")
  }

  /** Checksum validation (`luhn_check`) — the PII-adjacent data-quality
    * gate: card-shaped numeric fields validated by the Luhn mod-10
    * checksum before a pipeline treats them as real identifiers (and
    * masks them — see `fn_mask`/`text_pii_mask`). Synthetic 16-digit
    * numbers derived from the key give a deterministic valid/invalid
    * mix; the oracle recomputes the doubled-digit sum arithmetically.
    */
  def validationFns(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"),
        expr("lpad(CAST(o_orderkey * 7919 AS STRING), 16, '5')").as("num"))
      .select(col("o_orderkey"), col("num"),
        expr("luhn_check(num)").as("luhn_ok"))
      .orderBy("o_orderkey")

  /** XPath family (`xpath`, `xpath_string`, `xpath_long`) — element
    * text, attribute, and node-list extraction from XML payloads, the
    * per-row companion of the whole-file `scan_xml` source. Row-local
    * and codegen-adjacent (no shuffle, no UDF); the document is built
    * from typed columns so the extraction is oracle-checkable as a
    * round trip. SQL-only builtins, hence `expr(...)`.
    */
  def xpathFns(orders: DataFrame): DataFrame = {
    val xml = concat(
      lit("<order id=\""), col("o_orderkey"), lit("\"><status>"),
      col("o_orderstatus"), lit("</status><cents>"),
      round(col("o_totalprice") * 100).cast("long"), lit("</cents><pri>"),
      col("o_orderpriority"), lit("</pri></order>"))
    orders
      .select(col("o_orderkey"), xml.as("xml"))
      .select(
        col("o_orderkey"),
        expr("xpath_string(xml, '/order/status/text()')").as("status"),
        expr("xpath_long(xml, '/order/cents/text()')").as("cents"),
        expr("xpath_string(xml, '/order/@id')").as("id_attr"),
        expr("cast(size(xpath(xml, '/order/*/text()')) as int)")
          .as("n_children"))
      .orderBy("o_orderkey")
  }
}
