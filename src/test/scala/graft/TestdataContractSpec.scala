package graft

import org.apache.spark.sql.types._

/** Pins the POST-loader schema contract every operator in the library relies
  * on, across all three scale-factor dirs. The driver regenerates the
  * testdata between rounds; round 2 shipped a silent ts-dtype drift that
  * broke 17 operators at analysis time. This spec turns any such drift —
  * new column types, renamed columns, a changed timestamp vintage — into an
  * immediate, named test failure instead of a vanished correctness row.
  */
class TestdataContractSpec extends SparkSpec {

  private val contract: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
    "part" -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_shipdate" -> TimestampType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

  for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")) {
    test(s"every table in $sfDir honors the loader's schema contract") {
      contract.foreach { case (table, cols) =>
        val schema = Tables.t(spark, sfDir, table).schema
        cols.foreach { case (name, expected) =>
          val field = schema.fields.find(_.name == name)
          assert(field.isDefined, s"$table lacks column $name (has ${
            schema.fieldNames.mkString(", ")})")
          // ArrayType comparison ignores containsNull — element type is the
          // contract, nullability is the writer's business
          val got = field.get.dataType
          val ok = (got, expected) match {
            case (ArrayType(g, _), ArrayType(e, _)) => g == e
            case _ => got == expected
          }
          assert(ok, s"$table.$name is $got, operators expect $expected — " +
            "testdata drifted; adapt the loader (Tables.t) before anything else")
        }
      }
    }
  }
}
