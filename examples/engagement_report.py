"""Engagement-health report over the event log — the weekly readout a
growth/data team pulls, composed from engine analytics operators:

  1. growth accounting: daily new vs returning actives + the
     cumulative distinct-user curve (acquisition or retention?)
  2. frequency: weekly DAU/WAU stickiness (daily habit vs weekly)
  3. churn: half-over-half retained / churned / acquired split
  4. reliability: Kaplan-Meier time-to-first-error survival
  5. habit strength: longest consecutive-day activity streaks
  6. predictability: per-state Markov transition entropy
  7. traffic shape: Fano-factor burstiness per event type

Every stage is a registered, DuckDB-oracled query — the report is
pure composition, one lazy plan per section.

Run: python examples/engagement_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fmx
from fmx.queries.analytics import (
    event_active_streaks,
    event_burstiness,
    event_kaplan_meier,
    event_new_vs_returning,
    event_transition_entropy,
    event_user_churn,
    event_weekly_stickiness,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-engagement-report")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. growth accounting — the last day tells you where growth comes
    #    from; the cumulative curve is total distinct users ever seen
    nvr = event_new_vs_returning(spark, sf_dir).orderBy("day").collect()
    last = nvr[-1]
    print(f"growth: {len(nvr)} days observed; day {last['day']}: "
          f"{last['n_new']} new / {last['n_returning']} returning "
          f"(cumulative users {last['cum_users']})")

    # 2. frequency — stickiness -> 1 means a daily habit, -> 1/7 weekly
    for r in (event_weekly_stickiness(spark, sf_dir)
              .orderBy("week_start").collect()):
        print(f"stickiness: week {r['week_start']} wau={r['wau']} "
              f"avg_dau={r['avg_dau']:.1f} ratio={r['stickiness']:.3f}")

    # 3. churn — one row: the half-over-half user ledger
    c = event_user_churn(spark, sf_dir).collect()[0]
    print(f"churn: h1={c['n_h1']} h2={c['n_h2']} "
          f"retained={c['n_retained']} churned={c['n_churned']} "
          f"acquired={c['n_acquired']} churn_rate={c['churn_rate']}")

    # 4. reliability — survival past day t without a first error
    km = event_kaplan_meier(spark, sf_dir).orderBy("t_day").collect()
    head = ", ".join(f"S({r['t_day']})={r['survival']:.3f}"
                     for r in km[:5])
    print(f"survival (time to first error, {len(km)} steps): {head}")

    # 5. habit strength — the streakiest users
    top = event_active_streaks(spark, sf_dir).collect()
    print(f"streaks: top user {top[0]['user_id']} ran "
          f"{top[0]['longest_streak']} consecutive days "
          f"({top[0]['n_active_days']} active days total)")

    # 6. predictability — low-entropy states are templated flows
    ent = (event_transition_entropy(spark, sf_dir)
           .orderBy("prev_type").collect())
    for r in ent:
        print(f"transitions: from {r['prev_type']:<9} "
              f"H={r['entropy_bits']:.3f} bits "
              f"over {r['n_transitions']} transitions")

    # 7. traffic shape — F ~ 1 Poisson-steady, >> 1 bursty, < 1 throttled
    for r in event_burstiness(spark, sf_dir).orderBy("event_type").collect():
        print(f"burstiness: {r['event_type']:<9} "
              f"fano={r['fano_factor']:.3f} "
              f"(mean {r['mean_daily']:.1f}/day over {r['n_days']} days)")

    spark.stop()


if __name__ == "__main__":
    main()
