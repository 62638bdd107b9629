package graft

import org.scalatest.funsuite.AnyFunSuite

/** OPERATORS.md is the declared operator→gate contract; this pins it to the
  * code so it can never silently under-count coverage again (the round-8
  * finding: ~25 green gates absent from the map). No SparkSession needed —
  * the registry is inspected lazily without running anything. */
class CoverageSpec extends AnyFunSuite {

  private def operatorsMd: String = {
    val p = java.nio.file.Paths.get(s"${sys.props("user.dir")}/OPERATORS.md")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("every registered gate appears in OPERATORS.md") {
    val md = operatorsMd
    val missing = SparkEntry.defs.map(_.name).filterNot(n => md.contains(s"`$n`"))
    assert(missing.isEmpty,
      s"OPERATORS.md is missing gates: ${missing.mkString(", ")} — " +
        "regenerate with sbt \"runMain graft.CoverageMap\"")
  }

  test("the generated registry section is current") {
    val md = operatorsMd
    assert(md.contains(CoverageMap.Marker), "generated registry marker absent")
    assert(CoverageMap.render(md) == md,
      "OPERATORS.md registry is stale — regenerate with sbt \"runMain graft.CoverageMap\"")
  }

  test("modules partition defs exactly (no QueryDef outside a module)") {
    assert(SparkEntry.modules.flatMap(_._2).map(_.name).sorted ===
      SparkEntry.defs.map(_.name).sorted)
  }
}
