package graft

import org.scalatest.funsuite.AnyFunSuite

/** The promotion-honesty gate (round-16 verdict Next #6): 165/33 is
  * believed to be the oracle-coverage ceiling BECAUSE every rows-only
  * query carries an adjudicated non-mirrorability class in SURVEY
  * §2.10. That invariant only holds under drift if something enforces
  * it — this spec makes a NEW rows-only query (a `queries` entry with
  * no `oracleSql` twin) fail the suite until its inventory row lands
  * with a `rows-only` verification class, and symmetrically keeps a
  * promoted query's row from still claiming rows-only. */
class SurveyConsistencySpec extends AnyFunSuite {

  private lazy val survey = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    assert(java.nio.file.Files.exists(p),
      s"SURVEY.md not found under ${System.getProperty("user.dir")}")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The §2.10 inventory row for a query key → its Verified column. */
  private def verifiedCell(key: String): Option[String] = {
    val row = ("""(?m)^\| `""" + java.util.regex.Pattern.quote(key) +
      """` \|.*\| (.+) \|\s*$""").r
    row.findFirstMatchIn(survey).map(_.group(1).trim)
  }

  test("every declared query has a SURVEY §2.10 inventory row") {
    val missing = SparkEntry.queries.keySet.filter(verifiedCell(_).isEmpty)
    assert(missing.isEmpty,
      s"queries with no inventory row (add them to SURVEY §2.10): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every rows-only query carries a rows-only non-mirrorability class; every oracle query claims oracle") {
    val declared = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(declared),
      s"oracleSql keys with no queries entry: ${(oracled -- declared).toSeq.sorted}")
    val rowsOnly = declared -- oracled

    // a NEW rows-only query must land with its class adjudicated in
    // the inventory — the Verified cell starts with "rows-only" and
    // names WHY the oracle can't mirror it (the parenthetical class
    // or the trailing test description; an empty "rows-only" alone is
    // an unadjudicated claim)
    val badRowsOnly = rowsOnly.toSeq.sorted.flatMap { k =>
      verifiedCell(k) match {
        case None => Some(k -> "NO INVENTORY ROW")
        case Some(cell) if !cell.startsWith("rows") =>
          Some(k -> s"cell claims '$cell' but the query has no oracleSql")
        case Some(cell) if cell.replaceAll("^rows(-only)?[;,]?", "").trim.isEmpty =>
          Some(k -> "bare rows-only with no class/test adjudication")
        case _ => None
      }
    }
    assert(badRowsOnly.isEmpty,
      "rows-only queries must carry their non-mirrorability class in " +
        s"SURVEY §2.10:\n${badRowsOnly.map { case (k, w) => s"  $k: $w" }.mkString("\n")}")

    // the mirror direction: a PROMOTED query whose inventory row still
    // says rows-only under-reports the gate — stale the other way
    val stale = oracled.toSeq.sorted.flatMap { k =>
      verifiedCell(k) match {
        case Some(cell) if cell.startsWith("rows") =>
          Some(k -> cell.take(60))
        case _ => None
      }
    }
    assert(stale.isEmpty,
      "promoted queries whose SURVEY row still claims rows-only:\n" +
        stale.map { case (k, w) => s"  $k: $w" }.mkString("\n"))
  }

  test("the SURVEY inventory header counts match the declared split") {
    val declared = SparkEntry.queries.size
    val oracled = SparkEntry.oracleSql.size
    val header = """(\d+) declared queries, (\d+) oracle-hash-verified \+ (\d+) rows-only""".r
    header.findFirstMatchIn(survey) match {
      case Some(m) =>
        assert(m.group(1).toInt == declared && m.group(2).toInt == oracled &&
               m.group(3).toInt == declared - oracled,
          s"SURVEY header says ${m.group(1)}/${m.group(2)}/${m.group(3)} but " +
            s"SparkEntry declares $declared = $oracled oracle + ${declared - oracled} rows-only")
      case None => fail("SURVEY §2.10 header count line not found — " +
        "keep the 'N declared queries, K oracle-hash-verified + M rows-only' phrasing")
    }
  }
}
