"""`python -m twopaco_tpu` == the twopaco CLI."""

import sys

from twopaco_tpu.cli.twopaco import main

if __name__ == "__main__":
    sys.exit(main())
