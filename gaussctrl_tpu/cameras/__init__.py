from gaussctrl_tpu.cameras.camera import Cameras, projection_matrix, view_matrix
