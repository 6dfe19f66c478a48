"""timed_design_tpu — TPU-native protein sequence design framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
wells-wood-research/timed-design (reference mounted at /root/reference):
backbone PDB -> per-residue voxel frames -> 3D-CNN zoo -> per-residue
amino-acid / rotamer probabilities -> argmax design + Monte-Carlo sampling ->
analysis (metrics, rotamers, refold RMSD/GDT) -> CLI + UI.

Layering (bottom-up):
  constants  -> pure tables (amino acids, rotamer codec, BLOSUM62)
  structure  -> PDB parsing, geometry (dihedrals, Kabsch), properties
  voxel      -> frame construction + on-device voxelizer (XLA scatter / Pallas)
  io         -> aposteriori-HDF5 reader, datasetmap/CSV/fasta writers
               (byte-compatible with the reference at the edges)
  models     -> Flax 3D-CNN zoo (TIMED/ProDCoNN/DenseNet/DenseCPD) +
               Keras-h5 weight importer (h5py only, no TF)
  engine     -> jit/pjit batched prediction pipeline
  sample     -> temperature scaling + categorical MC sampling on device
  train      -> training step (new capability; the reference ships no trainer)
  parallel   -> mesh/sharding helpers for multi-chip scale-out
  analyse    -> metrics, rotamer eval, entropy, packing density, RMSD/GDT
  cli / ui   -> argparse entry points, Streamlit app
"""

__version__ = "0.1.0"
