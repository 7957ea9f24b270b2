from .checkpoint import CheckpointManager
from .fid import compute_fid, frechet_distance
from .optim import make_gan_optimizers
from .trainer import TrainState, Trainer, build_train_step
