import sys

from near_event_streams_spark.cli import main

sys.exit(main())
