package graft.ops

import graft.SparkSuite

class EventsSpec extends SparkSuite {

  test("session_window twin equals the gaps-and-islands sessionization") {
    // the two differ only on exact-gap boundaries (> vs >=); nanosecond
    // event timestamps make such a gap vanishingly unlikely, so on the
    // testdata the outputs must be identical row-for-row
    val dir = "/root/testdata/sf0.001"
    val gi = Events.sessions(spark, dir)
    val sw = Events.sessionsViaSessionWindow(spark, dir)
    assert(gi.exceptAll(sw).count() == 0)
    assert(sw.exceptAll(gi).count() == 0)
  }
}
