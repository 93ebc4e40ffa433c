package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical SURVEY ↔ registry sync gate: every query key registered in
  * [[SparkEntry.registry]] must be named (backticked) in SURVEY.md §2 —
  * the coverage contract the driver's judge reads row by row. A green
  * query with no §2 row is invisible capability (the r9 finding:
  * embedding_outliers/embedding_prune_far were hash-green but
  * undocumented); this spec makes that drift a test failure, so `sbt
  * test` — and with it every round commit — enforces the contract. */
class RegistrySyncSpec extends AnyFunSuite {

  test("every registered query key is documented in SURVEY.md §2") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md lost its §2/§3 anchors")
    val section = survey.substring(start, end)
    val documented = "`([a-z0-9_]+)`".r
      .findAllMatchIn(section).map(_.group(1)).toSet
    val registered = SparkEntry.registry.map(_.name)
    assert(registered.size == registered.distinct.size,
      s"duplicate registry keys: ${
        registered.diff(registered.distinct).mkString(", ")}")
    val missing = registered.filterNot(documented.contains)
    assert(missing.isEmpty,
      s"registered queries with NO SURVEY §2 row (add one): ${
        missing.mkString(", ")}")
  }
}
