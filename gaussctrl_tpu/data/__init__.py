from gaussctrl_tpu.data.dataparser import DataparserConfig, DataparserOutputs, parse_dataset
from gaussctrl_tpu.data.ply import read_ply
from gaussctrl_tpu.data.datamanager import DataManager, DataManagerConfig
