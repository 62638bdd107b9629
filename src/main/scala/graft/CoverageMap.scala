package graft

/** Regenerates the "Gate registry (generated)" appendix of OPERATORS.md
  * from [[SparkEntry.modules]], so the operator→gate coverage contract can
  * never drift from the code again (the round-8 finding: ~25 new gates were
  * registered and green but absent from the map).
  *
  * Everything above the marker line is the hand-curated SURVEY.md §2
  * narrative and is left untouched; everything below is rewritten.
  * CoverageSpec fails the build when the file is stale, and
  * `sbt "runMain graft.CoverageMap"` is the fix.
  */
object CoverageMap {
  val Marker = "<!-- GENERATED GATE REGISTRY — edit nothing below; regenerate with: sbt \"runMain graft.CoverageMap\" -->"

  /** The generated appendix (marker line included). */
  def registry: String = {
    val total = SparkEntry.defs.size
    val withOracle = SparkEntry.defs.count(_.oracle.isDefined)
    // NOTE: no stripMargin anywhere near the table rows — markdown's
    // leading '|' IS Scala's margin char and gets silently eaten
    val perModule = SparkEntry.modules.map { case (file, ds) =>
      val rows = ds.map { d =>
        val mode = if (d.oracle.isDefined) "DuckDB SQL" else "rows-only"
        s"| `${d.name}` | $mode |"
      }.mkString("\n")
      s"### ${file} (${ds.size})\n\n| Gate query | Oracle |\n|---|---|\n$rows"
    }.mkString("\n\n")
    // prose tracks reality: the universal "hash-compared against its
    // DuckDB oracle" claim is only printed while it is true; if an
    // oracle-less gate is ever registered the weaker wording (and the
    // per-row Oracle column) carries the distinction instead
    val compareClaim =
      if (withOracle == total)
        "Every registered `QueryDef` — the driver runs each through Verify at\n" +
          "sf0.01 and hash-compares against its DuckDB oracle (rows + schema +\n" +
          "value hash)."
      else
        "Every registered `QueryDef` — the driver runs each through Verify at\n" +
          "sf0.01; gates with a DuckDB oracle are hash-compared (rows + schema +\n" +
          "value hash), the rest get a rows-only check (see the Oracle column)."
    s"$Marker\n\n## Gate registry (generated)\n\n" +
      s"$compareClaim **$total gates, $withOracle with full SQL oracles.**\n" +
      "Grouped by the source file that registers them.\n\n" +
      s"$perModule\n"
  }

  /** OPERATORS.md with the appendix refreshed (curated head preserved). */
  def render(current: String): String = {
    val head = current.indexOf(Marker) match {
      case -1 => current.stripTrailing() + "\n\n"
      case i  => current.take(i)
    }
    head + registry
  }

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get(s"${sys.props("user.dir")}/OPERATORS.md")
    val current = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    java.nio.file.Files.write(path, render(current).getBytes("UTF-8"))
    println(s"OPERATORS.md: ${SparkEntry.defs.size} gates written")
  }
}
