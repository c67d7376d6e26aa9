package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopNeighborsSpec extends AnyFunSuite {

  private val agg = new TopNeighbors(3)
  private def c(id: Long, sim: Double) = NeighborCand(0L, id, sim)

  test("keeps k best by (sim desc, id asc); ranks are 1-based") {
    val buf = Seq(c(5, 0.1), c(2, 0.9), c(7, 0.5), c(1, 0.7), c(9, 0.2))
      .foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf).neighbors
    assert(out.map(r => (r.neighbor_id, r.rank)) == Seq((2L, 1L), (1L, 2L), (7L, 3L)))
  }

  test("ties break by neighbor_id ascending (oracle ROW_NUMBER order)") {
    val buf = Seq(c(9, 0.5), c(3, 0.5), c(6, 0.5), c(1, 0.5))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).neighbors.map(_.neighbor_id) == Seq(1L, 3L, 6L))
  }

  test("duplicate pairs (multi-band LSH) are absorbed, not double-counted") {
    val buf = Seq(c(2, 0.9), c(2, 0.9), c(3, 0.8), c(2, 0.9), c(4, 0.7), c(3, 0.8))
      .foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf).neighbors
    assert(out.map(_.neighbor_id) == Seq(2L, 3L, 4L))
    assert(out.map(_.rank) == Seq(1L, 2L, 3L))
  }

  test("merge of partial buffers equals single-pass result") {
    val xs = Seq(c(1, 0.3), c(2, 0.6), c(3, 0.1), c(4, 0.8), c(5, 0.6), c(6, 0.05))
    val single = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    val (a, b) = xs.splitAt(3)
    val merged = agg.finish(agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
    assert(single == merged)
    // and merge with overlapping duplicates
    val mergedDup = agg.finish(agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce), xs.foldLeft(agg.zero)(agg.reduce)))
    assert(single == mergedDup)
  }

  test("fewer than k candidates: all kept in order") {
    val buf = Seq(c(8, 0.2), c(4, 0.4)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).neighbors.map(_.neighbor_id) == Seq(4L, 8L))
  }
}
