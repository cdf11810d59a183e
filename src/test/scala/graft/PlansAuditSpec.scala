package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins PLANS.md to the DumpPlans flagship set, so plan documentation
 * can't silently drift from the code:
 *  - every pick names a real SparkEntry query (a renamed/removed query
 *    breaks the pick, not just the doc);
 *  - PLANS.md contains EXACTLY one `## name` section per pick — adding
 *    a flagship to DumpPlans.picks without regenerating PLANS.md (or
 *    regenerating with a stale binary) fails here;
 *  - the pick count itself is pinned, so dropping a section is a
 *    conscious edit to this spec, not an accident.
 */
class PlansAuditSpec extends AnyFunSuite {
  private val picks = graft.tools.DumpPlans.picks

  test("every DumpPlans pick is a live SparkEntry query") {
    val missing = picks.map(_._1).filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"picks without queries: $missing")
  }

  test("PLANS.md sections match DumpPlans.picks exactly") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")),
      "UTF-8")
    val sections = "(?m)^## (q_\\w+)$".r.findAllMatchIn(text)
      .map(_.group(1)).toSeq
    assert(sections.sorted == picks.map(_._1).sorted,
      s"PLANS.md is stale — regenerate with `sbt \"runMain graft.tools.DumpPlans\"`. " +
        s"missing=${picks.map(_._1).diff(sections)} extra=${sections.diff(picks.map(_._1))}")
  }

  test("flagship count is pinned") {
    assert(picks.size == 114,
      s"picks count changed to ${picks.size}: regenerate PLANS.md and update this pin")
  }
}
