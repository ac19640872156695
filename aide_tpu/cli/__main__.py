import sys

from aide_tpu.cli.main import main

sys.exit(main())
