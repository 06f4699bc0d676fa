package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

class SchemaContractSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  test("contract holds on the driver's fixture") {
    assert(SchemaContract.diagnose(spark, "/root/testdata/sf0.001").isEmpty)
  }

  test("perturbed fixture yields one clear error naming table and column") {
    val root = TempDirs.create("contract-perturb")
    val src = Paths.get("/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      Files.copy(src.resolve(s"$n.parquet"), Paths.get(s"$root/$n.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // Drift: documents loses `lang` and gains a wrong-family `n_chars`.
    spark.read.parquet(s"$root/documents.parquet")
      .drop("lang")
      .withColumn("n_chars", $"text") // string where an integral is expected
      .write.mode("overwrite").parquet(s"$root/documents2.parquet")
    val d2 = Paths.get(s"$root/documents.parquet")
    Files.delete(d2)
    // spark wrote a directory; just point a copy loop is overkill — rename
    Files.move(Paths.get(s"$root/documents2.parquet"), d2)

    val err = intercept[IllegalStateException](
      SchemaContract.assertOk(spark, root.toString))
    assert(err.getMessage.contains("documents.lang"))
    assert(err.getMessage.contains("MISSING"))
    assert(err.getMessage.contains("documents.n_chars"))
    // Healthy tables are NOT named as problems.
    assert(!err.getMessage.contains("lineitem."))
  }
}
