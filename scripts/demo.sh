#!/bin/bash
# config/daclip-sde/demo.sh parity.
### training ###
python -m daclip_tpu.cli.train_restoration -opt configs/daclip-sde/train.yml
### testing ###
# python -m daclip_tpu.cli.test_restoration -opt configs/daclip-sde/test.yml
