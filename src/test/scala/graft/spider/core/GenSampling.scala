package graft.spider.core

import org.scalacheck.Gen

/** Minimal property-check harness (the scalatestplus bridge is not in the
  * offline cache): sample a Gen n times and run the assertion block. */
trait GenSampling {
  def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    var produced = 0
    var attempts = 0
    var seed = org.scalacheck.rng.Seed(42L)
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    require(produced > n / 2, s"generator too sparse: $produced/$n")
  }
}
