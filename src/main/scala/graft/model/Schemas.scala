package graft.model

import org.apache.spark.sql.types._

/** Pinned schemas for every table the engine reads — SURVEY §1.3's "single
  * biggest robustness upgrade over the reference": the reference re-infers
  * schema on every hop (pd.read_sql, read_csv, Glue crawler) and silently
  * re-interprets drifted data; here every scan is validated against the
  * contract below and drift is an error naming the exact columns.
  *
  * Types mirror the driver-generated parquet exactly. `events.ts` has more
  * than one legal at-rest encoding (see [[eventsTsEncodings]]), so events
  * validates encoding-aware through [[eventsRawWith]] rather than a single
  * pinned entry in [[byName]].
  */
object Schemas {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val region: StructType = st(
    "r_regionkey" -> IntegerType, "r_name" -> StringType)

  val nation: StructType = st(
    "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType)

  val customer: StructType = st(
    "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType)

  val supplier: StructType = st(
    "s_suppkey" -> LongType, "s_name" -> StringType,
    "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)

  val part: StructType = st(
    "p_partkey" -> LongType, "p_name" -> StringType,
    "p_brand" -> StringType, "p_type" -> StringType,
    "p_size" -> IntegerType, "p_retailprice" -> DoubleType)

  val orders: StructType = st(
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)

  val lineitem: StructType = st(
    "l_orderkey" -> LongType, "l_partkey" -> LongType,
    "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
    "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType, "l_tax" -> DoubleType,
    "l_returnflag" -> StringType, "l_linestatus" -> StringType,
    "l_shipdate" -> TimestampNTZType)

  /** `events.ts` has more than one physically-equivalent legal at-rest
    * encoding of the same instants, because the upstream generator has
    * shipped both over time:
    *   - TIMESTAMP(NANOS), surfaced as LongType nanos under
    *     `spark.sql.legacy.parquet.nanosAsLong` (see graft.Sessions);
    *   - plain parquet timestamp[us], surfaced as TimestampNTZType (or
    *     TimestampType when isAdjustedToUTC is set).
    * [[Tables.events]] branches on the observed footer type and normalizes
    * all three to microsecond TimestampType; any OTHER shape is still hard
    * drift. Input data the engine does not control must not crash it when
    * the encoding is semantically identical. */
  val eventsTsEncodings: Seq[DataType] =
    Seq(LongType, TimestampNTZType, TimestampType)

  def eventsRawWith(ts: DataType): StructType = st(
    "event_id" -> LongType, "ts" -> ts, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)

  val documents: StructType = st(
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType)

  val embeddings: StructType = st(
    "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)

  val byName: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem,
    // no "events" entry: its at-rest ts encoding varies legally, so
    // Tables.load validates it encoding-aware against eventsRawWith.
    "documents" -> documents, "embeddings" -> embeddings)

  /** Fail fast with the exact drift when `actual` departs from `expected`
    * (names, order, or types; nullability is advisory in parquet and not
    * compared). */
  def validate(table: String, expected: StructType, actual: StructType): Unit = {
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (shape(expected) != shape(actual)) {
      val drift = shape(expected).zipAll(shape(actual), ("<missing>", NullType), ("<missing>", NullType))
        .collect { case (e, a) if e != a => s"  expected $e, found $a" }
      throw new IllegalStateException(
        s"schema drift in table '$table':\n${drift.mkString("\n")}")
    }
  }
}
