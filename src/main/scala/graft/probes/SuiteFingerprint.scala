package graft
package probes

/** Prints the oracle-suite composition fingerprint Bench guards its
  * baked-in DuckDB baseline with (count + hash over sorted name=SQL
  * pairs — round-14 advice: a name-only hash survived same-name SQL
  * rewrites). Run after any oracle change, re-bake the baseline, and
  * update [[Bench.RecordedDuckdbSuiteHash]] with the printed value.
  * Pure map construction — no SparkSession needed.
  */
object SuiteFingerprint {
  def main(args: Array[String]): Unit = {
    println(s"queries=${SparkEntry.oracleSql.size}")
    println(s"suiteHash=${Bench.suiteHash(SparkEntry.oracleSql)}")
  }
}
