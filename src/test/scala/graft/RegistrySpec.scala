package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integrity of the query registry itself — the driver's correctness gate
  * enumerates `Registry.runners` (a Map), so a duplicate name would
  * silently shadow an earlier query and SHRINK the gate without any test
  * failing. Pin the invariants that keep the gate honest.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique (Map construction must not shadow)") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names would shadow in byName/runners: $dups")
    assert(Registry.byName.size === Registry.all.size)
  }

  test("names follow the gate's snake_case contract") {
    // the driver uses names as file/dir names and JSON keys — keep them
    // shell- and path-safe.
    val bad = Registry.all.map(_.name).filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }

  test("every oracle is non-empty SQL and every runner is registered") {
    Registry.all.foreach { q =>
      q.oracle.foreach(sql => assert(sql.trim.nonEmpty, s"${q.name}: empty oracle"))
      assert(Registry.runners.contains(q.name))
    }
    assert(Registry.oracles.keySet.subsetOf(Registry.runners.keySet))
  }
}
