package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed metadata over the store's `meta: map<string,string>` column
  * (SURVEY §7.4 hard part).
  *
  * The reference keeps Python-typed metadata dicts and filters with Python
  * `==` — `{"priority": 1}` matches int 1 (and True, since Python bools are
  * ints) but NOT the string "1" (tests/demo.py:219-238). A plain
  * string-valued map silently string-compares ints; instead, values are
  * stored as their JSON literal (`1`, `1.5`, `true`, `"1"`), which preserves
  * the type through the string encoding, and [[typedEquals]] reproduces
  * Python `==` over that encoding:
  *
  *   - numbers match any numeric literal of equal value (1 == 1.0), plus
  *     `true`/`false` when the number is 1/0 (Python bool-is-int);
  *   - strings match only the quoted literal (so "1" != 1), with a
  *     legacy-compat fallback to the bare raw value for maps ingested
  *     before typed encoding;
  *   - booleans are the numeric 1/0 under the same rules.
  */
object TypedMeta {

  /** JSON string literal (quote + escape) — driver-side twin of the
    * encoding [[jsonLiteral]] produces through Spark's `to_json`.
    */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case '\b' => "\\b" // Jackson short escape (what to_json emits)
    case '\f' => "\\f"
    case c if c < ' ' => f"\\u${c.toInt}%04X"
    case c => c.toString
  } + "\""

  /** Encode any column value as its JSON literal, letting Catalyst resolve
    * the type: `to_json(struct(v))` yields `{"v":<literal>}` and the wrapper
    * is sliced off. Null values stay null (absent keys compare as null).
    */
  def jsonLiteral(c: Column): Column = {
    val wrapped = to_json(struct(c.as("v")))
    // '{"v":' is 5 chars, '}' closes: the literal is [6, len-6] (1-based)
    when(c.isNull, lit(null).cast("string"))
      .otherwise(wrapped.substr(lit(6), length(wrapped) - 6))
  }

  /** Build a typed meta map column from (key, typed column) pairs. */
  def metaColumn(fields: (String, Column)*): Column = {
    require(fields.nonEmpty, "need at least one meta field")
    map(fields.flatMap { case (k, v) => Seq(lit(k), jsonLiteral(v)) }: _*)
  }

  /** Driver-side value encoding for literal metadata rows. */
  def encode(value: Any): String = value match {
    case null => null
    case s: String => jsonString(s)
    case b: Boolean => b.toString
    case other => other.toString // numeric types render as JSON numbers
  }

  /** Python-`==` equality of `metaCol(key)` against a typed filter value. */
  def typedEquals(metaCol: Column, key: String, value: Any): Column =
    typedEqualsRaw(metaCol(key), value)

  /** Python-`==` equality of a RAW stored-encoding column (a meta map
    * value, or the `value` column of the persisted meta statistics —
    * which hold exactly those stored strings) against a typed filter
    * value. This is the stored-encoding inverse that lets the catalog's
    * statistics serve TYPED cardinalities: summing `n` over stats rows
    * this predicate accepts equals counting store rows the meta-side
    * [[typedEquals]] accepts, because both run the same predicate over
    * the same value strings.
    */
  def typedEqualsRaw(raw: Column, value: Any): Column = {
    def numeric(num: Double): Column = {
      val base = raw.try_cast("double") === lit(num)
      if (num == 1.0) base || raw === lit("true")
      else if (num == 0.0) base || raw === lit("false")
      else base
    }
    // legacy-compat: bare raw strings from pre-typed ingestion match string
    // filters, but ONLY when the raw value cannot be a typed JSON literal
    // (else "1" the string would collide with 1 the int). The converse
    // ambiguity is inherent to the shared column: a legacy bare "5" is
    // indistinguishable from a typed int 5 and WILL match numeric filters —
    // re-ingest through metaColumn/encode for strict typed semantics.
    def legacyBare(s: String): Column =
      raw === lit(s) && raw.try_cast("double").isNull &&
        !raw.isin("true", "false") && !raw.startsWith("\"")
    value match {
      case s: String => raw === lit(jsonString(s)) || legacyBare(s)
      case b: Boolean => numeric(if (b) 1.0 else 0.0)
      // integral values beyond 2^53 lose identity as doubles (adjacent longs
      // would falsely compare equal) — match those through an exact DECIMAL
      // cast instead, mirroring Python's arbitrary-precision ==
      case i: Int => numeric(i.toDouble)
      case l: Long if math.abs(l) < (1L << 53) => numeric(l.toDouble)
      case l: Long => raw.try_cast("decimal(38,0)") === lit(l)
      case s: Short => numeric(s.toDouble)
      case b: Byte => numeric(b.toDouble)
      // NOT f.toDouble: a stored float round-trips through its shortest
      // decimal repr ("0.1"), which try_cast parses as the double 0.1 —
      // f.toDouble (0.10000000149...) would never equal it
      case f: Float => numeric(f.toString.toDouble)
      case d: Double => numeric(d)
      case other => throw new IllegalArgumentException(
        s"unsupported typed filter value: $other (${other.getClass.getSimpleName})")
    }
  }

  /** Conjunction over a typed filter map — the typed analog of
    * Knn.metadataPredicate.
    */
  def typedPredicate(metaCol: Column, filter: Map[String, Any]): Column =
    filter.foldLeft(lit(true)) { case (acc, (k, v)) =>
      acc && typedEquals(metaCol, k, v)
    }
}
