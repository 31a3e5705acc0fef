package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the pure geo kernels (no Spark, runs via
  * sbt's native ScalaCheck support): invariants that must hold for EVERY
  * cell/point, not just the golden fixtures — the algebra the cell index
  * (CellId), the cover ops (CellOps' column twins) and the tile math rely
  * on at any zoom. */
object KernelProps extends Properties("geo-kernels") {

  private val cellGen: Gen[Long] = for {
    z <- Gen.choose(1, 29)
    tx <- Gen.choose(0L, (1L << z) - 1)
    ty <- Gen.choose(0L, (1L << z) - 1)
  } yield CellId.pack(z, tx, ty)

  private val innerCellGen: Gen[Long] = for {
    z <- Gen.choose(1, 28) // leaves room for children at z+1
    tx <- Gen.choose(0L, (1L << z) - 1)
    ty <- Gen.choose(0L, (1L << z) - 1)
  } yield CellId.pack(z, tx, ty)

  property("pack/unpack roundtrip") = forAll(cellGen) { c =>
    CellId.pack(CellId.z(c), CellId.tx(c), CellId.ty(c)) == c
  }

  property("every child's parent is the cell itself") = forAll(innerCellGen) { c =>
    val ch = CellId.children(c)
    ch.length == 4 && ch.distinct.length == 4 && ch.forall(CellId.parent(_) == c)
  }

  property("ring(r) cells sit at Chebyshev distance exactly r, same z") =
    forAll(cellGen, Gen.choose(1, 4)) { (c, r) =>
      CellId.ring(c, r).forall { n =>
        val d = math.max(math.abs(CellId.tx(n) - CellId.tx(c)),
                         math.abs(CellId.ty(n) - CellId.ty(c)))
        d == r && CellId.z(n) == CellId.z(c)
      }
    }

  private val interiorRingGen: Gen[(Long, Int)] = for {
    r <- Gen.choose(1, 4)
    z <- Gen.choose(4, 29) // 2^z > 2r so an interior cell exists
    tx <- Gen.choose(r.toLong, (1L << z) - 1 - r)
    ty <- Gen.choose(r.toLong, (1L << z) - 1 - r)
  } yield (CellId.pack(z, tx, ty), r)

  property("ring(r) of an interior cell is COMPLETE: exactly 8r cells") =
    forAll(interiorRingGen) { case (c, r) =>
      // soundness alone is vacuously true on a buggy empty ring; the ring
      // feeds kNN candidate gathering, where a silently dropped cell means
      // silently missing neighbors
      val ring = CellId.ring(c, r)
      ring.length == 8 * r && ring.distinct.length == ring.length
    }

  private val zGen = Gen.choose(1, 22)
  private val tileGen: Gen[(Int, Long, Long)] = for {
    z <- zGen
    tx <- Gen.choose(0L, (1L << z) - 1)
    ty <- Gen.choose(0L, (1L << z) - 1)
  } yield (z, tx, ty)

  property("tile center projects back into the same tile (offset 0)") =
    forAll(tileGen) { case (z, tx, ty) =>
      val (lat, lng) = Mercator.wgsAtTile(tx, ty, z)
      Mercator.tileAtWgs(lat, lng, z, 0, 0) == (tx, ty)
    }

  property("mil floors toward negative infinity") =
    forAll(Gen.chooseNum(-180.0, 180.0)) { x =>
      val m = Mercator.mil(x)
      m <= x * 1e6 && x * 1e6 < m + 1
    }

  property("in-tile remainder is always in [0, 256)") =
    forAll(Gen.chooseNum(-85.0, 85.0), Gen.chooseNum(-180.0, 179.999),
           Gen.choose(1, 19)) { (lat, lng, z) =>
      val (_, _, rx, ry) = Mercator.tileAndPixelAtWgs(lat, lng, z, 0, 0)
      rx >= 0 && rx < 256 && ry >= 0 && ry < 256
    }
}
