package graft.lang

import org.scalatest.funsuite.AnyFunSuite
import Lexer._

/** Token-level decisions that parser-side rejoining could not make
  * (whitespace is gone by then) — hyphenated keyword attrs join only
  * when adjacent and only in the pattern-attr position.
  */
class LexerSpec extends AnyFunSuite {

  test("adjacent hyphens join in the pattern-attr position") {
    val toks = tokenize("[?e :instance-of ?v]")
    assert(toks.contains(TIdent("instance-of")), toks)
  }

  test("spaced hyphen after an attr is NOT swallowed into the name") {
    val toks = tokenize("[?e :a - b]")
    assert(toks.containsSlice(
      Seq(TIdent("a"), TOp("-"), TIdent("b"))), toks)
  }

  test("spaced negative value keeps the attr name intact") {
    val toks = tokenize("[?e :n -5]")
    assert(toks.containsSlice(Seq(TIdent("n"), TOp("-"), TNum(5))), toks)
  }

  test("ternary-colon position still lexes subtraction") {
    val toks = tokenize("x ? y : z-1")
    assert(toks.containsSlice(Seq(TIdent("z"), TOp("-"), TNum(1))), toks)
  }

  test("object-literal values keep subtraction") {
    val toks = tokenize("{'k': a-b}")
    assert(toks.containsSlice(
      Seq(TIdent("a"), TOp("-"), TIdent("b"))), toks)
  }

  test("ternary with a qvar branch keeps subtraction in the other") {
    // the else-branch colon follows a qvar token, but that qvar was
    // NOT a pattern entity — `a-b` must stay arithmetic
    val toks = tokenize("{?q : 1}.(c ? ?q : a-b)")
    assert(toks.containsSlice(
      Seq(TIdent("a"), TOp("-"), TIdent("b"))), toks)
  }

  test("binding-set literal values keep subtraction after a qvar key") {
    val toks = tokenize("{?q : a-b}")
    assert(toks.containsSlice(
      Seq(TIdent("a"), TOp("-"), TIdent("b"))), toks)
  }

  test("multi-source pattern entity still opens attr position") {
    val toks = tokenize("[$DBa ?e :instance-of ?v]")
    assert(toks.contains(TIdent("instance-of")), toks)
  }
}
