"""Command-line tools: tomel, towav, tophase, fromphase.

Thin argparse equivalents of the reference Go CLIs
(/root/reference/cmd/{tomel,towav,tophase,fromphase}/main.go), with the same
baked-in parameters and file-routing rules.
"""
