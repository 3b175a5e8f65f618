#!/usr/bin/env python
"""Train the pMHC diffusion model (drop-in for the reference CLI):

    python optimize.py train_set.hdf5 100 model.pth
"""

from pmhc_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
