package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Startup guard against testdata fixture drift.
  *
  * Round 8 lost 34 gate queries to one silently-changed parquet encoding;
  * the failures surfaced as scattered `DATATYPE_MISMATCH` analysis errors
  * far from the cause. This check runs once at Bench/Verify startup and
  * turns any drift into ONE error naming the table and column.
  *
  * Types are pinned by family, not exact physical type: `Tables.df`
  * deliberately adapts timestamp encodings (nanos-long / NTZ / LTZ all
  * normalize to TIMESTAMP), and integer width or nullability drift is
  * harmless to every query. A missing column, a renamed column, or a
  * cross-family change (string→int, scalar→array) is what breaks queries,
  * and that is what fails here.
  */
object SchemaContract {
  sealed trait Family { def ok(dt: DataType): Boolean }
  private case object Integral extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
  }
  private case object Fractional extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
  }
  private case object Str extends Family {
    def ok(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  }
  private case object Ts extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case _: TimestampType | _: TimestampNTZType | _: DateType => true
      case _ => false
    }
  }
  private case object FloatVec extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => Fractional.ok(et)
      case _ => false
    }
  }

  /** Expected (column, family) per table, in no particular order — column
    * ORDER drift is tolerated (queries select by name), extra columns are
    * tolerated (projection ignores them). */
  val expected: Map[String, Seq[(String, Family)]] = Map(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Str,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Seq("p_partkey" -> Integral, "p_name" -> Str,
      "p_brand" -> Str, "p_type" -> Str, "p_size" -> Integral,
      "p_retailprice" -> Fractional),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderdate" -> Ts, "o_orderpriority" -> Str),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> Ts),
    "events" -> Seq("event_id" -> Integral, "ts" -> Ts,
      "user_id" -> Integral, "event_type" -> Str, "value" -> Fractional,
      "props" -> Str),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Str,
      "lang" -> Str, "source" -> Str, "n_chars" -> Integral),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> FloatVec,
      "label" -> Integral))

  /** Returns one diagnosis line per violation; empty = contract holds.
    * Checks the schema AFTER `Tables.df` adaptation — that is the schema
    * every query actually sees. */
  def diagnose(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val actual =
        try Right(Tables.df(spark, dir, table).schema)
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      actual match {
        case Left(e) =>
          Seq(s"$table: unreadable (${e.getClass.getSimpleName}: ${e.getMessage})")
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType).toMap
          cols.flatMap { case (col, fam) =>
            byName.get(col) match {
              case None =>
                Some(s"$table.$col: MISSING (have: ${schema.fieldNames.mkString(", ")})")
              case Some(dt) if !fam.ok(dt) =>
                Some(s"$table.$col: type ${dt.simpleString} outside expected family $fam")
              case _ => None
            }
          }
      }
    }

  /** Fail fast with a single named error if the fixture drifted. */
  def assertOk(spark: SparkSession, dir: String): Unit = {
    val problems = diagnose(spark, dir)
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"testdata schema contract violated in $dir:\n  " +
          problems.mkString("\n  ") +
          "\n(fixture drift — fix Tables.df / the contract before trusting query errors)")
  }
}
