"""CLI entry points: predict, sample, analyse_rotamers, voxelize, train."""
