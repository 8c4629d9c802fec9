import sys

from kmertools_tpu.cli import main

sys.exit(main())
