package graft.testutil

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check harness over raw scalacheck Gens
  * (the scalatestplus bridge is not in the offline cache). Fixed seeds ->
  * fully reproducible runs. */
trait Checks {
  protected def cases: Int = 200

  private def sample[A](g: Gen[A], i: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(i))

  def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (0 until cases).foreach(i => f(sample(ga, i * 2654435761L + 1)))

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until cases).foreach { i =>
      f(sample(ga, i * 2654435761L + 1), sample(gb, i * 40503L + 7))
    }

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    (0 until cases).foreach { i =>
      f(sample(ga, i * 2654435761L + 1), sample(gb, i * 40503L + 7), sample(gc, i * 97L + 13))
    }

  def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    (0 until cases).foreach { i =>
      f(sample(ga, i * 2654435761L + 1), sample(gb, i * 40503L + 7),
        sample(gc, i * 97L + 13), sample(gd, i * 8191L + 29))
    }

  def forAll[A, B, C, D, E](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D], ge: Gen[E])(
      f: (A, B, C, D, E) => Unit): Unit =
    (0 until cases).foreach { i =>
      f(sample(ga, i * 2654435761L + 1), sample(gb, i * 40503L + 7),
        sample(gc, i * 97L + 13), sample(gd, i * 8191L + 29), sample(ge, i * 131071L + 31))
    }
}
