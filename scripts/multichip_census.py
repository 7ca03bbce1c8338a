"""Full strategy × mode multi-chip census → MULTICHIP_CENSUS.json.

Runs every cell of the production-shape compile census (6 sharding
strategies × {MSE, ZINB, aug-in-loop}) plus the small-shape executed
strategy-equality matrix, on a virtual CPU mesh — see
dvae_tpu/parallel/census.py for what each cell asserts.  The committed
MULTICHIP_CENSUS.json is the durable record; the driver dry run
(__graft_entry__.dryrun_multichip) re-runs a budget-bounded prefix of the
same cells every round.

Usage:
    python scripts/multichip_census.py [--devices 8] [--mesh d,a,f]
        [--out MULTICHIP_CENSUS.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvae_tpu.parallel.census import main  # noqa: E402

if __name__ == "__main__":
    if "--out" not in " ".join(sys.argv):
        sys.argv.append("--out=MULTICHIP_CENSUS.json")
    main()
