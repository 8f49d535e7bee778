package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BinPackSpec extends AnyFunSuite {

  test("G3 greedy packing with reset (hand-computed)") {
    assert(BinPack.greedyBins(Seq(3L, 3L, 3L), 6L) == Seq(0, 0, 1))
    assert(BinPack.greedyBins(Seq(5L, 1L, 5L, 1L), 6L) == Seq(0, 0, 1, 1))
  }

  test("item larger than budget occupies its own bin") {
    assert(BinPack.greedyBins(Seq(10L), 5L) == Seq(0))
    assert(BinPack.greedyBins(Seq(10L, 1L, 10L), 5L) == Seq(0, 1, 2))
  }

  test("greedy differs from cumsum-floor (the documented approximation gap)") {
    // greedy resets at each boundary; cumsum-floor does not
    val w = Seq(4L, 4L, 4L)
    assert(BinPack.greedyBins(w, 6L) == Seq(0, 1, 2))
    val cumsumFloor = w.scanLeft(0L)(_ + _).init.map(c => (c / 6L).toInt)
    assert(cumsumFloor == Seq(0, 0, 1)) // the approximation disagrees here
  }

  test("pack preserves payload order") {
    val packed = BinPack.pack(Seq("a", "bb", "ccc"), (s: String) => s.length.toLong, 3L)
    assert(packed == Seq(("a", 0), ("bb", 0), ("ccc", 1)))
  }

  test("empty input") {
    assert(BinPack.greedyBins(Nil, 5L).isEmpty)
  }

  test("property (seeded sweep): bins start at 0, consecutive nondecreasing; bin totals within budget unless a single item overflows") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val ws = Vector.fill(rnd.nextInt(30))(1L + rnd.nextInt(20))
      val budget = 1L + rnd.nextInt(30)
      val bins = BinPack.greedyBins(ws, budget)
      if (ws.isEmpty) assert(bins.isEmpty)
      else {
        assert(bins.head == 0)
        assert(bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 })
        ws.zip(bins).groupBy(_._2).foreach { case (_, items) =>
          assert(items.map(_._1).sum <= budget || items.size == 1)
        }
      }
    }
  }
}
