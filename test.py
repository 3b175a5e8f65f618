#!/usr/bin/env python
"""Sample peptide structures with a trained model (drop-in for the
reference CLI):

    python test.py model.pth test_set.hdf5
"""

from pmhc_tpu.cli.sample_cli import main

if __name__ == "__main__":
    main()
