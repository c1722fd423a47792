package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the exact least-squares solver: the Cramer
  * determinants returned by solveNormal must SATISFY the normal
  * equations exactly in rationals — Σⱼ aᵢⱼ·detⱼ = bᵢ·detA for every
  * row i (with detA ≠ 0 the solution is unique, so this verifies the
  * solve completely, independent of how the determinants were
  * expanded). Matrices are built as A'ᵀA' + I from random integer
  * A' — symmetric positive definite, so detA > 0 always, mirroring
  * the ridged Gram matrices the query builds.
  */
object QualityModelProps extends Properties("QualityModel.solveNormal") {

  private val cell = Gen.chooseNum(-30L, 30L)
  private val matGen: Gen[Array[Array[BigInt]]] = for {
    rows <- Gen.chooseNum(4, 8)
    data <- Gen.listOfN(rows * 4, cell)
  } yield {
    val ap = data.map(BigInt(_)).grouped(4).toArray
    Array.tabulate(4, 4)((i, j) =>
      ap.map(r => r(i) * r(j)).sum + (if (i == j) 1 else 0))
  }
  private val vecGen: Gen[Array[BigInt]] =
    Gen.listOfN(4, Gen.chooseNum(-2000L, 2000L))
      .map(_.map(BigInt(_)).toArray)

  property("cramer solution satisfies the ridged normal equations") =
    Prop.forAll(matGen, vecGen) { (a, b) =>
      val (dA, dJ) = operators.QualityModel.solveNormal(a, b)
      val pd = dA > 0
      val solves = (0 until 4).forall(i =>
        (0 until 4).map(j => a(i)(j) * dJ(j)).sum == b(i) * dA)
      ("ridged Gram must be PD" |: pd) && ("A·w = b exactly" |: solves)
    }

  property("solution is scale-consistent: doubling b doubles every detJ") =
    Prop.forAll(matGen, vecGen) { (a, b) =>
      val (dA1, dJ1) = operators.QualityModel.solveNormal(a, b)
      val (dA2, dJ2) = operators.QualityModel.solveNormal(a, b.map(_ * 2))
      dA1 == dA2 && dJ1.zip(dJ2).forall { case (x, y) => y == x * 2 }
    }
}
