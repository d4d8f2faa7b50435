import sys

from mapper_tpu.cli import main

sys.exit(main())
