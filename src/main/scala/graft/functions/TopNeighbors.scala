package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate pair (directed). */
final case class NeighborCand(vec_id: Long, neighbor_id: Long, sim: Double)
final case class RankedNeighbor(neighbor_id: Long, rank: Long, sim: Double)
/** Bounded agg buffer: parallel arrays sorted by (sim desc, id asc),
  * length ≤ k. A Product so the buffer ships with the codegen'd
  * product encoder (no kryo). */
final case class TopKBuf(sims: Array[Double], ids: Array[Long])
final case class TopKOut(neighbors: Seq[RankedNeighbor])

/** Typed top-k-neighbors aggregate: keeps the k best (sim DESC,
  * neighbor_id ASC) candidates per group in a bounded buffer with
  * map-side partial aggregation.
  *
  * Why not `row_number() over (partition by vec_id order by ...)`:
  * the window plan shuffles and sorts EVERY candidate row (at 10^9
  * vectors with ~10^3 LSH candidates each, ~10^12 rows through one
  * shuffle); this aggregator reduces each map partition to ≤ k rows
  * per vector before the exchange — the same result with a shuffle
  * ~|candidates|/k smaller, and no global sort.
  *
  * Duplicate candidates (the same pair surfaced by several LSH bands)
  * carry bitwise-identical sims, so membership dedup inside the
  * bounded buffer is exact and replaces a pre-aggregation DISTINCT —
  * dropping a second full-candidate shuffle. Ordering matches the
  * oracle's ROW_NUMBER (sim DESC, neighbor_id ASC) on exact doubles.
  */
final class TopNeighbors(k: Int)
    extends Aggregator[NeighborCand, TopKBuf, TopKOut] {

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(buf: TopKBuf, sim: Double, id: Long): TopKBuf = {
    val n = buf.ids.length
    var i = 0
    while (i < n && better(buf.sims(i), buf.ids(i), sim, id)) i += 1
    if (i == k) return buf // worse than the k-th
    if (i < n && buf.sims(i) == sim && buf.ids(i) == id) return buf // dup pair
    val m = math.min(n + 1, k)
    val sims = new Array[Double](m)
    val ids = new Array[Long](m)
    System.arraycopy(buf.sims, 0, sims, 0, i)
    System.arraycopy(buf.ids, 0, ids, 0, i)
    sims(i) = sim; ids(i) = id
    val tail = math.min(n - i, m - i - 1)
    System.arraycopy(buf.sims, i, sims, i + 1, tail)
    System.arraycopy(buf.ids, i, ids, i + 1, tail)
    TopKBuf(sims, ids)
  }

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)
  override def reduce(b: TopKBuf, c: NeighborCand): TopKBuf =
    insert(b, c.sim, c.neighbor_id)
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var acc = a
    var i = 0
    while (i < b.ids.length) { acc = insert(acc, b.sims(i), b.ids(i)); i += 1 }
    acc
  }
  override def finish(buf: TopKBuf): TopKOut =
    TopKOut((0 until buf.ids.length)
      .map(i => RankedNeighbor(buf.ids(i), i + 1L, buf.sims(i))))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
}
