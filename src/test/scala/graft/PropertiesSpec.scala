package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.StableMatcher
import graft.ops.Parsers

/** ScalaCheck properties (SURVEY §5.4): stable-matching invariants, parser
  * round-trips, candidate validation — pure-function layer, no Spark.
  */
object MatcherProperties extends Properties("StableMatcher") {

  private val attrs = Gen.oneOf("a", "b", "c", "d", "e")
  private val scores = Gen.choose(0.0, 1.0)

  private val prefsGen: Gen[StableMatcher.Prefs] =
    Gen.mapOf(Gen.zip(attrs,
      Gen.nonEmptyListOf(Gen.zip(attrs, scores)).map(_.distinctBy(_._1))))

  property("each round is a matching (src and tgt used at most once)") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      val byRound = StableMatcher.matchCase(fwd, bwd, maxRounds = 3).groupBy(_.round)
      byRound.values.forall { ms =>
        ms.map(_.srcAttr).distinct.size == ms.size &&
          ms.map(_.tgtAttr).distinct.size == ms.size
      }
    }

  property("matches only pair attrs present in both preference directions") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      val fwdPairs = for ((s, cs) <- fwd.toSet; (t, _) <- cs)
        yield (s.trim.toLowerCase, t.trim.toLowerCase)
      val bwdPairs = for ((t, cs) <- bwd.toSet; (s, _) <- cs)
        yield (s.trim.toLowerCase, t.trim.toLowerCase)
      StableMatcher.matchCase(fwd, bwd, 3)
        .forall(m => fwdPairs.contains((m.srcAttr, m.tgtAttr)) &&
          bwdPairs.contains((m.srcAttr, m.tgtAttr)))
    }

  property("deterministic: same input, same output") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      StableMatcher.matchCase(fwd, bwd, 3) == StableMatcher.matchCase(fwd, bwd, 3)
    }

  property("a pair never repeats across rounds") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      val ms = StableMatcher.matchCase(fwd, bwd, 5)
      ms.map(m => (m.srcAttr, m.tgtAttr)).distinct.size == ms.size
    }
}

object ParserProperties extends Properties("Parsers") {

  private val key = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val value = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("parseJsonMap round-trips rendered string/array maps") =
    forAll(Gen.mapOf(Gen.zip(key, Gen.nonEmptyListOf(value)))) { m =>
      val json = m.map { case (k, vs) =>
        s""""$k": [${vs.map(v => s""""$v"""").mkString(", ")}]"""
      }.mkString("{", ", ", "}")
      Parsers.parseJsonMap(json) == Some(m)
    }

  property("parseMatches finds the block regardless of surrounding prose") =
    forAll(value, Gen.alphaStr, Gen.alphaStr) { (v, pre, post) =>
      Parsers.parseMatches(s"""$pre {"matches": ["$v"]} $post""") == Seq(v)
    }

  property("validateCandidates accepts exactly the small allowed subsets") =
    forAll(Gen.someOf("a", "b", "c", "d", "e", "f", "g")) { subset =>
      val allowed = Set("a", "b", "c", "d", "e", "f", "g")
      val res = Parsers.validateCandidates(subset.mkString(", "), allowed)
      if (subset.isEmpty || subset.size > 5) res.isEmpty
      else res.contains(subset.toSeq)
    }

  property("parseConfidence only accepts 0-100") =
    forAll(Gen.choose(-500, 500)) { n =>
      val r = Parsers.parseConfidence(s"Confidence: $n")
      // the regex only matches 1-3 digit magnitudes; sign is not captured
      if (n >= 0 && n <= 100) r.contains(n)
      else r.forall(v => v >= 0 && v <= 100)
    }
}
