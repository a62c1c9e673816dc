package graft

import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}

/** Lints the declared-query surface (`SparkEntry.queries`) against the
  * driver-gate conventions that otherwise live only in folklore:
  *
  *   1. No top-level array / map / binary / struct output column. The
  *      driver's checker row-sorts results with pandas `sort_values` and
  *      hashes cell values — ndarray / dict / bytes cells are unhashable,
  *      so such a column ERRORS the gate even when the values are correct
  *      (the r16 q244 failure: `TypeError: unhashable type:
  *      'numpy.ndarray'`). Queries that produce arrays must project them
  *      through `array_join` / explode / a boolean gate first (q20, q244,
  *      the media-checksum gates all do).
  *   2. Every oracle key names a declared query (a dangling oracle is a
  *      typo'd name that silently weakens the gate to rows-only).
  *
  * Building each plan also smoke-checks that every declared query
  * COMPILES at sf0.001 — a decode or analysis error surfaces here in
  * `sbt test` instead of at the driver's Verify run.
  */
class DeclaredSurfaceSpec extends SparkSpec {

  test("oracleSql keys all name declared queries") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracle entries with no matching query: ${dangling.toSeq.sorted.mkString(", ")}")
  }

  test("no declared query outputs a top-level array/map/binary/struct column") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val schema = fn(spark, sf).schema
        schema.fields.foreach { f =>
          f.dataType match {
            case _: ArrayType | _: MapType | BinaryType | _: StructType =>
              offenders += s"$name.${f.name}: ${f.dataType.simpleString}"
            case _ => ()
          }
        }
      } catch {
        // a query that cannot even build its plan is its own failure
        case e: Throwable => failed += s"$name: ${e.getMessage}"
      } finally {
        graft.compile.Compiler.releaseAllCaches()
      }
    }
    assert(failed.isEmpty, s"queries that failed to compile at sf0.001:\n  ${failed.mkString("\n  ")}")
    assert(offenders.isEmpty,
      "driver-unhashable output columns (project through array_join / " +
        s"explode / a boolean gate):\n  ${offenders.mkString("\n  ")}")
  }
}
