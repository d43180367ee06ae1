package graft.sink

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the wildcard-query glob compiler: for ANY glob and
  * ANY candidate string (over an alphabet that deliberately includes
  * regex metacharacters), the compiled anchored regex must agree with a
  * direct recursive glob matcher — the semantics `matchWildcard`
  * promises. Catches under-escaping (a `+` in a glob acting as a regex
  * quantifier) and anchoring mistakes (substring matches) across the
  * whole input space rather than a handful of goldens.
  */
class GlobPropertySpec extends AnyFunSuite {

  // reference semantics: * = any run, ? = exactly one char, else literal
  private def globMatch(g: List[Char], s: List[Char]): Boolean = g match {
    case Nil => s.isEmpty
    case '*' :: gt =>
      globMatch(gt, s) || (s.nonEmpty && globMatch(g, s.tail))
    case '?' :: gt => s.nonEmpty && globMatch(gt, s.tail)
    case c :: gt => s.nonEmpty && s.head == c && globMatch(gt, s.tail)
  }

  private val alphabet: Gen[Char] =
    Gen.oneOf('a', 'b', '.', '+', '(', ')', '[', ']', '{', '}', '|',
      '^', '$', '\\', '-')
  private val globChar: Gen[Char] =
    Gen.frequency((3, Gen.const('*')), (3, Gen.const('?')), (8, alphabet))
  private val globGen: Gen[String] =
    Gen.listOfN(6, globChar).map(_.mkString).suchThat(_.length <= 6)
  private val strGen: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, alphabet)).map(_.mkString)

  test("compiled glob regex ≡ recursive glob matcher on adversarial alphabets") {
    val prop = Prop.forAll(globGen, strGen) { (g: String, s: String) =>
      val re = java.util.regex.Pattern.compile(DocQueries.globToRegex(g))
      re.matcher(s).matches() == globMatch(g.toList, s.toList)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(result.passed, result.status.toString)
  }

  test("anchoring: a glob never matches a strict superstring") {
    val prop = Prop.forAll(strGen.suchThat(_.nonEmpty)) { (s: String) =>
      // the literal glob "s" must not match "sa" or "as"
      val re = java.util.regex.Pattern.compile(DocQueries.globToRegex(s))
      re.matcher(s).matches() &&
        !re.matcher(s + "a").matches() && !re.matcher("a" + s).matches()
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
  }
}
