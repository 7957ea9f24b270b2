from .images import denormalize, make_grid, save_image_grid
from .tb_writer import SummaryWriter
