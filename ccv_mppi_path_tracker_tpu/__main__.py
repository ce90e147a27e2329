import sys

from ccv_mppi_path_tracker_tpu.cli import main

sys.exit(main())
