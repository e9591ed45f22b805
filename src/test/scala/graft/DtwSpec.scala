package graft

import graft.analytics.Dtw
import org.scalatest.funsuite.AnyFunSuite

/** DTW kernel vs values produced by the reference implementation
  * (similarity.py:200-352, :536-608) on the FIXTURES.md §2.1 series. */
class DtwSpec extends AnyFunSuite {
  private val a = Array(1.0, 2.0, 3.0, 4.0, 5.0)
  private val c = Array(5.0, 4.0, 3.0, 2.0, 1.0)
  private val d = Array(1.1, 2.2, 2.8, 4.1, 5.2)
  private val x = Array(1.0, 3.0, 4.0, 9.0, 8.0, 2.0, 1.0, 5.0, 7.0, 3.0)
  private val y = Array(2.0, 4.0, 8.0, 7.0, 1.0, 2.0, 6.0, 8.0, 4.0)

  test("identity distance is 0") {
    assert(Dtw.distance(a, a) == 0.0)
  }

  test("banded distances match reference values") {
    assert(math.abs(Dtw.distance(a, c) - 12.0) < 1e-12)
    assert(math.abs(Dtw.distance(a, d) - 0.8000000000000003) < 1e-12)
    assert(math.abs(Dtw.distance(x, y) - 9.0) < 1e-12)
    assert(math.abs(Dtw.distance(x, y, Some(2)) - 9.0) < 1e-12)
    assert(math.abs(Dtw.distance(a, c, Some(0)) - 12.0) < 1e-12) // unbanded
  }

  test("empty input yields 0.0 (reference edge rule)") {
    assert(Dtw.distance(Array.empty, a) == 0.0)
    assert(Dtw.distance(a, Array.empty) == 0.0)
  }

  test("unequal lengths widen the band to reach the corner") {
    val short = Array(1.0, 2.0)
    val long = (1 to 40).map(_.toDouble).toArray
    assert(Dtw.distance(short, long, Some(1)).isFinite)
  }

  test("path variant matches reference distance and path") {
    val (dist, path) = Dtw.distanceWithPath(x, y)
    assert(math.abs(dist - 9.0) < 1e-12)
    assert(path == Seq((0, 0), (1, 0), (2, 1), (3, 2), (4, 3), (5, 4), (6, 5),
      (7, 6), (8, 7), (9, 8)))
    assert(path.head == ((0, 0)) && path.last == ((x.length - 1, y.length - 1)))
  }
}
