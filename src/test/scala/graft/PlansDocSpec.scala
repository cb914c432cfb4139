package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the committed PLANS.md audit snapshot honest against the live
  * query registry (round-8 verdict task #2): the snapshot trailing the
  * registry by two queries went unnoticed for two rounds because
  * nothing asserted the count. Now a stale snapshot fails `sbt test`.
  */
class PlansDocSpec extends AnyFunSuite {

  private val plans: String = {
    val p = java.nio.file.Paths.get("PLANS.md")
    assume(java.nio.file.Files.exists(p), "PLANS.md not present")
    java.nio.file.Files.readString(p)
  }

  test("PLANS.md AUDIT-COUNT matches the live registry") {
    val m = "AUDIT-COUNT queries=(\\d+)".r.findFirstMatchIn(plans)
    assert(m.isDefined,
      "PLANS.md lacks an AUDIT-COUNT line — regenerate via PlanAudit")
    assert(m.get.group(1).toInt === SparkEntry.queries.size,
      s"PLANS.md snapshot counts ${m.get.group(1)} queries but the " +
        s"registry has ${SparkEntry.queries.size} — regenerate PLANS.md")
  }

  test("PLANS.md has one AUDIT line per registered query") {
    val audited = "(?m)^AUDIT (\\S+)".r.findAllMatchIn(plans)
      .map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.diff(audited)
    assert(missing.isEmpty,
      s"queries registered but absent from PLANS.md audit: $missing")
  }

  test("every windowGlobalOk adjudication names a registered query") {
    val stale = PlanAudit.windowGlobalOk.keySet.diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty, s"adjudications for unregistered queries: $stale")
  }
}
