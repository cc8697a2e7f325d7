import json, time
from pathlib import Path
from instacart_next_order_recommendation_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
from instacart_next_order_recommendation_tpu.data.synthetic import generate_instacart_csvs
from instacart_next_order_recommendation_tpu.train import TrainConfig, TwoTowerTrainer
from instacart_next_order_recommendation_tpu.utils import setup_colored_logging

setup_colored_logging()
base = Path('/root/repo/.bench_ws/tpu_train')
base.mkdir(parents=True, exist_ok=True)
data_dir = generate_instacart_csvs(base / 'data', n_users=3000, n_products=2000, orders_per_user=(5, 11), seed=5)
prep = InstacartDataPrep(data_dir=data_dir, output_dir=base / 'processed', eval_frac=0.1)
prep.prepare()

cfg = TrainConfig({
    'processed_dir': str(prep.effective_output_dir()),
    'output_dir': str(base / 'model'),
    'model_name': 'minilm-l6',
    'max_seq_length': 128,
    'epochs': 3,
    'train_batch_size': 64,
    'eval_batch_size': 256,
    'learning_rate': 2e-4,
    'vocab_size': 10000,
    'logging_steps': 50,
})
t0 = time.time()
trainer = TwoTowerTrainer(cfg)
result = trainer.train()
print('TOTAL', time.time() - t0)
print(json.dumps(result['history'], indent=2)[:2000])
