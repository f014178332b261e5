package graft

import java.nio.file.Files
import scala.sys.process.{Process, ProcessLogger}
import org.scalatest.funsuite.AnyFunSuite

/** Static guard for the q169 failure class (rounds 11-12): an oracle
  * SQL whose output column reaches Arrow as decimal128 — DuckDB types
  * sum(BIGINT) (windowed or plain, carried through max/min) as
  * HUGEINT — hash-mismatches in the driver's Arrow-typed gate even
  * when every VALUE equals Spark's int64 output. This spec runs every
  * declared oracleSql through DuckDB→Arrow at sf0.001 (seconds) and
  * fails the build on any decimal-family output column, turning a
  * once-per-round external surprise into a compile-time-ish error.
  *
  * Uses the box's driver-side python3+duckdb, so it cancels (not
  * fails) where that tooling is absent — the guard also runs in the
  * verify-skill gate via tools/oracle_type_guard.py.
  */
class OracleTypeGuardSpec extends AnyFunSuite {

  test("no oracle SQL emits a decimal/hugeint Arrow output column") {
    val sfDir = new java.io.File(TestSpark.sf0001)
    assume(sfDir.isDirectory, s"testdata ${sfDir} not present")
    val guard = new java.io.File("tools/oracle_type_guard.py")
    assume(guard.isFile, "guard script not found (cwd not repo root?)")
    // Try-wrapped: with no python3 binary at all, ProcessBuilder.start()
    // throws IOException BEFORE the exit code exists — that must still
    // cancel (the documented contract), not fail the suite
    val pyOk = scala.util.Try(
      Process(Seq("python3", "-c", "import duckdb, pyarrow")).!).getOrElse(1) == 0
    assume(pyOk, "driver-side python3 + duckdb + pyarrow not available")

    val tmp = Files.createTempFile("oracle_sql", ".json")
    try {
      Files.writeString(tmp, Verify.oracleSqlJson)
      val out = new StringBuilder
      val log = ProcessLogger(l => out.append(l).append('\n'))
      val code = Process(
        Seq("python3", guard.getPath, sfDir.getPath, tmp.toString)).!(log)
      assert(code == 0,
        s"oracle_type_guard found decimal-typed or erroring oracle " +
          s"SQLs:\n$out")
    } finally Files.deleteIfExists(tmp)
  }
}
