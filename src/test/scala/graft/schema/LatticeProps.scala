package graft.schema

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the coercion lattice (SURVEY §5.3): the numeric
  * widening is a join-semilattice (commutative, associative, idempotent)
  * and string is an absorbing element.
  */
object LatticeProps extends Properties("CoercionLattice") {

  private val numeric = Gen.oneOf(Types.sparkNumberTypes)
  private val anyDtype = Gen.oneOf(Types.sparkNumberTypes ++ Seq("string"))

  private def coerce(ds: Seq[String]): String =
    Types.coerceColumn("c", ds.map(Some(_)))

  property("commutative: permutation-invariant") =
    forAll(Gen.nonEmptyListOf(anyDtype)) { ds =>
      coerce(ds) == coerce(ds.reverse) && coerce(ds) == coerce(ds.sorted)
    }

  property("idempotent: singleton resolves to itself") =
    forAll(anyDtype) { d => coerce(Seq(d)) == d }

  property("associative: pairwise fold equals n-ary resolution") =
    forAll(Gen.nonEmptyListOf(numeric)) { ds =>
      ds.reduce((a, b) => coerce(Seq(a, b))) == coerce(ds)
    }

  property("string absorbs everything") =
    forAll(Gen.nonEmptyListOf(anyDtype)) { ds =>
      coerce(ds :+ "string") == "string"
    }

  property("numeric join is the highest-precedence member") =
    forAll(Gen.nonEmptyListOf(numeric)) { ds =>
      coerce(ds) == Types.sparkNumberTypes.find(ds.contains).get
    }

  property("missing slots never influence the numeric winner") =
    forAll(Gen.nonEmptyListOf(numeric)) { ds =>
      Types.coerceColumn("c", ds.map(Some(_)) :+ None) == coerce(ds)
    }
}

/** Laws for the pure reshape helpers (reference generic.py contracts). */
object ReshapeProps extends Properties("Reshape") {
  import graft.ops.Reshape

  private val key = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(4)))

  property("fillTuples: uniform output length = max input length") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val filled = Reshape.fillTuples(keys.map(_.toSeq), "ffill")
      val maxLen = keys.map(_.length).max
      filled.forall(_.length == maxLen)
    }

  property("fillTuples: already-max tuples unchanged") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val maxLen = keys.map(_.length).max
      val filled = Reshape.fillTuples(keys.map(_.toSeq), "ffill")
      keys.zip(filled).filter(_._1.length == maxLen).forall { case (in, out) => in == out }
    }

  property("keyValuePairs: pair count = sum of seq sizes (scalars count 1)") =
    forAll(Gen.listOf(Gen.zip(Gen.alphaLowerStr, Gen.listOf(Gen.choose(0, 9))))) { m =>
      val in: Seq[(String, Any)] = m.map { case (k, vs) => k -> (vs: Any) }
      Reshape.keyValuePairs(in).size == m.map(_._2.size).sum
    }

  property("invertNestedKeys is an involution") =
    forAll(Gen.mapOf(Gen.zip(key.map(_.toSeq: Seq[String]), Gen.choose(0, 100)))) { m =>
      Reshape.invertNestedKeys(Reshape.invertNestedKeys(m)) == m
    }
}
