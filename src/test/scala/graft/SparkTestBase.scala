package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for Column-level specs. One session per suite
  * (getOrCreate reuses the underlying context across suites in the same JVM,
  * so the whole test run pays a single Spark startup).
  */
trait SparkTestBase extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = Engine.builder(cpus = "2").getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites; don't stop it here.
    super.afterAll()
  }
}
