package graft

import org.apache.spark.sql.SparkSession

/** One shared session per test JVM (Test/fork := true → all suites share
  * it); built by the same [[Engine.session]] factory the runtime uses, so
  * native-function registration is exercised by every spec.
  */
object SparkTestSession {
  lazy val spark: SparkSession = Engine.session(cpus = 4, appName = "graft-test")
}

trait SparkTestSession {
  // lazy val (not def): `import spark.implicits._` needs a stable identifier
  lazy val spark: SparkSession = SparkTestSession.spark
}
