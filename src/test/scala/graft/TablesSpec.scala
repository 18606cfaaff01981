package graft

import org.apache.spark.sql.types._

/** Schema drift gate (r11 verdict task 3c): load every table through
  * `graft.Tables` at ALL THREE scale factors and assert the column types
  * downstream queries rely on. This is the test that would have caught
  * the round-11 incident in minutes: the driver regenerated testdata
  * with events.ts as `timestamp[us]` where every prior round shipped
  * `timestamp[ns]`, and the hard-coded ns read path broke all 27
  * events queries at plan time — silently, because nothing asserted the
  * loaded types.
  *
  * Two levels of strictness, deliberately:
  *  - `events.ts` must be EXACTLY TimestampType — `Tables.events`
  *    normalizes every physical encoding (ns-as-long, µs-NTZ, µs-LTZ)
  *    to it, so anything else means the adapter missed an encoding.
  *  - `o_orderdate`/`l_shipdate` load raw (no normalization layer), so
  *    they only need to be timestamp-LIKE (NTZ or LTZ): the queries
  *    over them use date-part functions that accept both.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def tsLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private val exact: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    // embedding checked structurally below — ArrayType equality includes
    // containsNull, which is generator-dependent noise
    "embeddings" -> Map("vec_id" -> LongType, "label" -> IntegerType))

  private def loaders = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
    "region" -> Tables.region, "nation" -> Tables.nation,
    "customer" -> Tables.customer, "supplier" -> Tables.supplier,
    "part" -> Tables.part, "orders" -> Tables.orders,
    "lineitem" -> Tables.lineitem, "events" -> Tables.events,
    "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)

  for (dir <- sfDirs) {
    test(s"every table at $dir loads with the expected column types") {
      for ((table, load) <- loaders.toSeq.sortBy(_._1)) {
        val schema = load(spark, dir).schema
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        for ((col, want) <- exact(table)) {
          assert(byName.contains(col), s"$table missing column $col (has ${schema.fieldNames.mkString(",")})")
          assert(byName(col) == want, s"$table.$col: got ${byName(col)}, want $want")
        }
        byName.get("embedding").foreach {
          case ArrayType(et, _) => assert(et == FloatType, s"embedding element: $et")
          case other => fail(s"embedding not an array: $other")
        }
      }
      // raw-loaded timestamp columns only need to be timestamp-like
      assert(tsLike(Tables.orders(spark, dir).schema("o_orderdate").dataType))
      assert(tsLike(Tables.lineitem(spark, dir).schema("l_shipdate").dataType))
    }
  }

  test("events.ts epoch range is sane (catches ns/µs unit misreads)") {
    // A ns value misread as µs lands in year ~56000; a µs value rebuilt
    // through an extra div-1000 lands in 1970. Either would pass a bare
    // type check — pin the actual epoch-seconds range instead.
    val bounds = Tables.events(spark, sf)
      .selectExpr("min(unix_timestamp(ts)) as lo", "max(unix_timestamp(ts)) as hi")
      .head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(lo > 1500000000L, s"events.ts min epoch $lo predates 2017 — unit misread?")
    assert(hi < 2500000000L, s"events.ts max epoch $hi is past 2049 — unit misread?")
  }
}
