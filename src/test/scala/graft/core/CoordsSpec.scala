package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Coordinate parsing spec — behaviors mirror the reference's exhaustive
  * coords tests (`/root/reference/oxbow/src/coords.rs:299-433`). */
class CoordsSpec extends AnyFunSuite {

  test("whole-chromosome") {
    assert(Region.parse("chr1") == Region("chr1", 0, None))
    assert(Region.parse("chrM") == Region("chrM", 0, None))
  }

  test("UCSC one-based closed (default)") {
    // chr1:10001-20000 (1-based closed) == [10000, 20000) 0-based half-open
    assert(Region.parse("chr1:10001-20000") == Region("chr1", 10000, Some(20000)))
    assert(Region.parse("chr1:1-100") == Region("chr1", 0, Some(100)))
  }

  test("UCSC with thousands separators , and _") {
    assert(Region.parse("chr1:10,001-20,000") == Region("chr1", 10000, Some(20000)))
    assert(Region.parse("chr1:10_001-20_000") == Region("chr1", 10000, Some(20000)))
  }

  test("UCSC open-ended start") {
    assert(Region.parse("chr1:5000") == Region("chr1", 4999, None))
  }

  test("UCSC in zero-based half-open system") {
    assert(Region.parse("chr1:5000-6000", CoordSystem.ZeroBasedHalfOpen) ==
      Region("chr1", 5000, Some(6000)))
  }

  test("bracket half-open") {
    assert(Region.parse("chr1:[10000,20000)") == Region("chr1", 10000, Some(20000)))
    assert(Region.parse("chr1:[10000,)") == Region("chr1", 10000, None))
  }

  test("bracket one-based closed") {
    assert(Region.parse("chr1:[10001,20000]") == Region("chr1", 10000, Some(20000)))
  }

  test("display round-trips through parse") {
    val r = Region("chr1", 10000, Some(20000))
    assert(Region.parse(r.toString) == r)
    val open = Region("chr2", 5, None)
    assert(Region.parse(open.toString) == open)
  }

  test("invalid inputs rejected") {
    intercept[IllegalArgumentException](Region.parse(""))
    intercept[IllegalArgumentException](Region.parse("chr1:abc-def"))
    intercept[IllegalArgumentException](Region("chr1", 100, Some(50)))
    // separator-only coordinates: the documented IAE, never a raw
    // NumberFormatException
    intercept[IllegalArgumentException](Region.parse("chr1:,"))
    intercept[IllegalArgumentException](Region.parse("chr1:1,000-___"))
    // bedgraph declares its own fields
    intercept[IllegalArgumentException](graft.core.BedSchema.parse(
      "bedgraph", Seq(graft.core.BedField("x",
        org.apache.spark.sql.types.LongType))))
  }

  test("overlaps semantics are half-open") {
    val r = Region("chr1", 100, Some(200))
    assert(r.overlaps("chr1", 150, 160))
    assert(r.overlaps("chr1", 199, 300))
    assert(!r.overlaps("chr1", 200, 300)) // touching, half-open → no overlap
    assert(!r.overlaps("chr1", 0, 100))
    assert(!r.overlaps("chr2", 150, 160))
    assert(Region("chr1", 100, None).overlaps("chr1", 1000000, 1000001))
  }

  test("coordinate system offsets") {
    assert(CoordSystem.fromCode("11") == CoordSystem.OneBasedClosed)
    assert(CoordSystem.fromCode("01") == CoordSystem.ZeroBasedHalfOpen)
    val r = Region("chr1", 10000, Some(20000))
    assert(r.startIn(CoordSystem.OneBasedClosed) == 10001)
    assert(r.startIn(CoordSystem.ZeroBasedHalfOpen) == 10000)
  }

  test("property: bracket display round-trip for arbitrary regions") {
    val rng = new scala.util.Random(42)
    val names = Vector("chr1", "chr2", "chrX", "scaffold_12")
    (1 to 500).foreach { _ =>
      val start = rng.nextLong(1000000L)
      val end = if (rng.nextBoolean()) Some(start + rng.nextLong(1000000L)) else None
      val r = Region(names(rng.nextInt(names.size)), start, end)
      assert(Region.parse(r.toString) == r)
    }
  }

  test("property: UCSC 1-based closed maps to start-1") {
    val rng = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val s = 1 + rng.nextLong(100000000L); val l = rng.nextLong(1000L)
      val r = Region.parse(s"chr9:$s-${s + l}")
      assert(r.start == s - 1 && r.end.contains(s + l))
    }
  }
}
